"""SparkSession factory.

Reference behavior being replaced: a single-process pandas pipeline
(``/root/reference/main.py:13-25``) with UTC-pinned datetimes
(``transform_raw_data.py:53``, ``generate_report.py:14,24``). We pin the
Spark session timezone to UTC so timestamp semantics match both the
reference and the DuckDB oracle (UTC-naive timestamps).

Scale posture: AQE on (runtime coalesce + skew-join splitting),
shuffle partitions sized to local cores (on a real cluster this is
``2-3 × total executor cores`` — set via SPARK_GRAFT_SHUFFLE_PARTITIONS).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "facebook_ad_library_data_pipeline_spark") -> SparkSession:
    """Build (or fetch) the tuned local session.

    All knobs are configuration, not custom Catalyst code (SURVEY.md §4):
    UTC session tz, AQE + partition coalescing + skew-join handling,
    Arrow for pandas interchange, shuffle partitions ≈ cores for local.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", DEFAULT_CPUS)
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    # Task retries: local mode takes maxFailures from the MASTER STRING
    # (local[N] pins it to 1; spark.task.maxFailures is ignored), so
    # retry-path tests/evidence (injected first-attempt task failures —
    # the cluster reality of speculative execution and preemption) opt
    # in via env. Unset = fail-fast local[N], so ordinary test runs
    # still surface flaky tasks instead of silently retrying them.
    # `or None`: a SET-BUT-EMPTY var behaves as unset (shells and CI
    # configs blank vars more often than they unset them)
    retries = os.environ.get("SPARK_GRAFT_TASK_RETRIES") or None
    if retries is not None and (not retries.isdecimal() or int(retries) < 1):
        # fail HERE with the env var's name, not later with Spark's
        # opaque "could not parse Master URL"; note the value is
        # maxFailures (1 = fail on first failure, same as unset local[N];
        # 2 = one retry), so 0 is meaningless rather than "default"
        raise ValueError(
            "SPARK_GRAFT_TASK_RETRIES must be a positive integer "
            f"(spark maxFailures: 2 = one retry), got {retries!r}"
        )
    master = f"local[{cpus},{retries}]" if retries else f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # NOT the biggest heap that fits: with an oversized heap (90g)
        # GC almost never runs, so the GC-triggered ContextCleaner never
        # purges finished broadcasts/shuffle state — profiled 2-50×
        # degradation over a 67-query session. 16g keeps GC regular and
        # the whole bench stable.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # UI off for bench/test hygiene; scripts/scale_evidence.py flips
        # it on to read measured shuffle metrics from the REST API
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Bucketed scans stay bucket-aware even for plain lookups (the
        # planner otherwise auto-disables them and forfeits bucket
        # PRUNING); set at session build so shared-session plans are
        # independent of query execution order (q_bucket_pruned_lookup
        # also sets it defensively for driver-built cold sessions).
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long nanos and convert in the catalog loader
        # (truncating to micros, matching DuckDB's ns→µs behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # State-store maintenance (RocksDB snapshot upload) runs on ONE
        # JVM-wide scheduled task whose interval is captured from the
        # first query that ever loads a state store — a later query's
        # own interval conf is ignored. The 60s production default
        # makes snapshot_checkpoint (which must AWAIT a snapshot
        # upload) stall up to a minute on bounded local runs; 2s ticks
        # over a handful of loaded providers are noise here. Cold
        # driver-built sessions keep the default and rely on
        # snapshot_checkpoint's longer deadline instead.
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "2s")
        # Unix-domain sockets for every JVM<->Python channel (Spark 4.1):
        # workers, Arrow batches, the tws state server. Same-host IPC
        # without loopback-TCP handshake/port churn — measured A/B in
        # OPTIMIZATION_r16.md. Env-gated for re-measure.
        .config(
            "spark.python.unix.domain.socket.enabled",
            os.environ.get("SPARK_GRAFT_PY_UDS") or "true",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
