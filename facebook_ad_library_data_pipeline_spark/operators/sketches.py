"""Mergeable-sketch aggregates + the GROUPED_AGG pandas-UDF shape.

Absent from the reference (it has no aggregation at all — SURVEY.md
§2.B); these are the approximate/streaming-friendly aggregates a 100 TB
pipeline leans on: a sketch is computed once per partition/day and
MERGED — never recomputed over raw history. HLL sketch bytes are
engine-specific → rows-only checks with determinism/soundness tests in
tests/test_extras.py; the count-distinct they estimate is checked
against exact counts in tests. The grouped-agg pandas UDF (IQR) is the
one pandas-UDF flavor the rest of the repo didn't already cover
(scalar: adslib.transform.detect_lang_udf; grouped map:
operators/extras; mapInPandas: multimodal/media; stateful:
streaming/stateful).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query("q_hll_partial_merge", oracle=None, tags=("sketch", "agg", "approx"))
def q_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level sketch pattern: per-orderdate-year HLL sketches of
    distinct customers (the 'daily partial' at real scale), then
    hll_union_agg over the partials for the global estimate — raw data
    is touched exactly once. Returns per-year estimates plus the merged
    ALL row. Rows-only (sketch internals), but the estimates are
    deterministic for fixed input; sanity vs exact distinct asserted in
    tests."""
    o = load_table(spark, sf_dir, "orders")
    partials = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    )
    per_year = partials.select(
        F.col("order_year").cast("string").alias("scope"),
        F.hll_sketch_estimate("sketch").alias("approx_customers"),
    )
    merged = partials.agg(F.hll_union_agg("sketch").alias("sketch")).select(
        F.lit("ALL").alias("scope"), F.hll_sketch_estimate("sketch").alias("approx_customers")
    )
    return per_year.unionByName(merged).orderBy("scope")


_IQR_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25), 2)
           AS price_iqr,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_grouped_agg_pandas_iqr", oracle=_IQR_ORACLE, tags=("pandas-udf", "agg"))
def q_grouped_agg_pandas_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: interquartile range of order totals per
    priority. numpy's linear-interpolation percentile is the same
    estimator as DuckDB quantile_cont, so this one IS oracle-checkable
    (unlike Spark's approx_percentile). Arrow ships each group's column
    once; the UDF sees a plain pd.Series — no per-row Python."""

    @F.pandas_udf("double")
    def iqr(v: pd.Series) -> float:
        q75, q25 = v.quantile(0.75), v.quantile(0.25)
        return float(q75 - q25)

    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count is
    # a pandas aggregate too — still a single pass.
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(iqr("o_totalprice"), 2).alias("price_iqr"),
            n_rows("o_totalprice").alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query("q_countmin_heavy_hitters", oracle=None, tags=("sketch", "approx"))
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over event_type with per-key point estimates.
    The sketch is built in ONE distributed aggregate (count_min_sketch
    is an ImperativeAggregate with map-side partials, like HLL); the
    point lookups read the tiny sketch on the driver against the
    distinct keys. CMS overestimates but never underestimates —
    soundness asserted in tests against exact counts."""
    ev = load_table(spark, sf_dir, "events")
    sketch_row = ev.agg(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms")
    ).collect()[0]
    # Point queries against the serialized sketch happen driver-side on
    # the distinct key set (5 keys) — the raw data is not re-scanned.
    raw = bytes(sketch_row.cms)
    # Deserialize via the JVM helper to keep estimates identical to the
    # aggregating implementation.
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(raw)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    keys = [r.event_type for r in ev.select("event_type").distinct().collect()]
    est = [(k, int(cms.estimateCount(k))) for k in sorted(keys)]
    return spark.createDataFrame(est, "event_type string, approx_n long")
