"""Vendored-dependency bootstrap.

The Spark 4 typed-state streaming runtime (transformWithStateInPandas)
speaks its state-server protocol through ``google.protobuf``; this
container ships no protobuf wheel and has no network, so the repo
vendors a minimal clean-room runtime under ``vendor/google/protobuf``
(see its docstring for scope/provenance). This module makes it
importable in every process that needs it:

1. driver: ``sys.path`` insert;
2. future JVMs / python daemons: ``os.environ['PYTHONPATH']`` (the JVM
   launched by this driver inherits the env, and python workers inherit
   the JVM's);
3. an already-running SparkContext: ``sc.environment['PYTHONPATH']``
   (feeds the env of worker factories created after the mutation — the
   typed-state runtime uses a dedicated worker module, so its factory
   spawns fresh; verified end-to-end against a session created before
   the bootstrap, including with pre-warmed pandas-UDF daemons).

A REAL protobuf installation always wins: the vendor path is appended
only when ``google.protobuf`` is not already importable.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable (vendored fallback); wire the
    path into worker environments when a session is given. Returns True
    if the import works after bootstrapping."""
    try:
        import google.protobuf  # noqa: F401

        have = True
    except ImportError:
        have = False
    if not have:
        if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
            return False
        if VENDOR_DIR not in sys.path:
            sys.path.insert(0, VENDOR_DIR)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return False
        # Propagate to workers ONLY when the vendored runtime is the one
        # this driver imported. PYTHONPATH precedes site-packages on the
        # workers, so exporting it unconditionally would let the minimal
        # shim shadow a real wheel there — breaking worker-side consumers
        # that need features the shim omits (maps, extensions, JSON).
        existing = os.environ.get("PYTHONPATH", "")
        if VENDOR_DIR not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                VENDOR_DIR + os.pathsep + existing if existing else VENDOR_DIR
            )
        if spark is not None:
            env = spark.sparkContext.environment
            cur = env.get("PYTHONPATH", "")
            if VENDOR_DIR not in cur.split(os.pathsep):
                env["PYTHONPATH"] = (
                    VENDOR_DIR + os.pathsep + cur if cur else VENDOR_DIR
                )
    return True
