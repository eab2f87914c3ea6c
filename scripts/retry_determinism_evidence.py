"""Retry/speculative-execution determinism evidence (r10 verdict item 5).

The portable-hash sampling/shard/split family (operators/splits.py,
operators/training_prep.py) claims run/cluster-reproducibility: fold,
shard, reservoir, and weighted-sample membership are pure BIGINT hash
functions of the row, so re-running a task — the cluster reality of
speculative execution, preemption, and fetch-failure retries — must
not move a single row. This script proves it under ADVERSITY rather
than assuming it:

- The session is built with ``SPARK_GRAFT_TASK_RETRIES=2``, which
  session.py translates into the ``local[N,2]`` master string (local
  mode ignores ``spark.task.maxFailures``; the master string is the
  only retry knob — the same reason the datasink retry probe in
  tests/test_pysource.py uses it).
- Each family query is first run CLEAN to a canonical value-hash
  (columns sorted by name, rows sorted; floats at FULL repr precision,
  deliberately stricter than the driver comparator's %.6g because the
  claim here is bit-for-bit).
- The query's ``load_table`` is then monkeypatched to interpose a
  fail-once ``mapInPandas`` passthrough: partition 0's FIRST attempt
  of every stage that scans the table drops a marker file and raises;
  the retry (attempt 1) passes the batches through untouched. The
  query therefore really executes through a failed-and-retried task
  — asserted via the marker files, not assumed.
- The injected run's canonical hash must equal the clean run's.

A nondeterministic assignment function (e.g. one seeded from
partition id, task attempt, or wall clock — the classic
rand()/monotonically_increasing_id() mistakes) flips the hash here,
because the retried task would re-draw different values.

Run from /root/repo:  python scripts/retry_determinism_evidence.py
Writes one JSON line per query and a final summary line; exits 1 on
any hash mismatch or on a run where no injected failure fired.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import tempfile
from datetime import datetime
from pathlib import Path

os.environ.setdefault("SPARK_GRAFT_TASK_RETRIES", "2")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_UI", "false")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from facebook_ad_library_data_pipeline_spark.operators import splits, training_prep  # noqa: E402
from facebook_ad_library_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
MARK_DIR = Path(tempfile.mkdtemp(prefix="retry_evidence_"))


def _norm(v):
    # STRICTER than the driver-twin sweep comparator on purpose: floats
    # normalize at FULL precision (repr), because this script's claim
    # is bit-for-bit reproducibility under retry — a %.6g comparator
    # would mask exactly the small accumulation-order drift a re-run
    # task can introduce (the round-1 q_join_multiway lesson in
    # tests/oracle_harness.py).
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def canonical_hash(df) -> tuple[str, int]:
    cols = [c.lower() for c in df.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(_norm(r[i]) for i in order) for r in df.collect())
    payload = repr((sorted(cols), rows)).encode()
    return hashlib.md5(payload).hexdigest(), len(rows)


def fail_once_passthrough(df, tag: str):
    """Interpose a mapInPandas stage whose partition-0 task fails its
    first attempt (after dropping a marker file) and passes batches
    through untouched on retry."""
    schema = df.schema
    mark_dir = str(MARK_DIR)

    def gen(batches):
        from pathlib import Path as _Path

        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            _Path(
                mark_dir, f"fail_{tag}_stage{ctx.stageId()}"
            ).write_text("injected first-attempt failure")
            raise RuntimeError(f"injected first-attempt failure [{tag}]")
        yield from batches

    return df.mapInPandas(gen, schema)


QUERIES = {
    "q_shard_assign": training_prep,
    "q_kfold_assign": splits,
    "q_group_reservoir": splits,
    "q_weighted_sample": splits,
}


def main() -> int:
    spark = get_spark("retry_determinism_evidence")
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master
    assert master.endswith(",2]"), (
        f"session must allow task retries (got master {master}); "
        "run via this script, not an existing session"
    )

    bad = 0
    for name, module in QUERIES.items():
        fn = getattr(module, name)
        clean_hash, n_rows = canonical_hash(fn(spark, SF))

        real_load = module.load_table
        tag = name

        def patched(spark_, sf_dir_, table_, _real=real_load, _tag=tag):
            return fail_once_passthrough(_real(spark_, sf_dir_, table_), _tag)

        module.load_table = patched
        try:
            injected_hash, n_rows_inj = canonical_hash(fn(spark, SF))
        finally:
            module.load_table = real_load

        fired = sorted(p.name for p in MARK_DIR.glob(f"fail_{tag}_*"))
        ok = bool(fired) and injected_hash == clean_hash and n_rows == n_rows_inj
        bad += 0 if ok else 1
        print(
            json.dumps(
                {
                    "query": name,
                    "n_rows": n_rows,
                    "clean_hash": clean_hash,
                    "injected_hash": injected_hash,
                    "injected_failures_fired": len(fired),
                    "deterministic_under_retry": ok,
                }
            ),
            flush=True,
        )

    print(
        json.dumps(
            {
                "summary": "retry_determinism",
                "master": master,
                "sf_dir": SF,
                "queries": len(QUERIES),
                "mismatches": bad,
            }
        )
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
