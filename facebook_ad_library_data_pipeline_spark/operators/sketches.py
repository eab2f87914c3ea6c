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

import math

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


# Quantiles are computed over integer CENTS on both engines, and the
# half-up rounding is done in exact arithmetic (floor(x + 0.5)): at
# quartile positions the interpolation fraction is r/4 ∈ {0,.25,.5,.75},
# which is exact in binary, so lower + frac*(upper-lower) over int64
# cents is bit-identical across numpy and DuckDB. round(double, 2)
# straight on dollars is NOT: a quantile landing on a half-cent is one
# ulp away from flipping (observed at sf0.001: 249895.52 vs .53).
_IQR_ORACLE = """
SELECT o_orderpriority,
       floor(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75)
             - quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25)
             + 0.5) / 100.0 AS price_iqr,
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
    once; the UDF sees a plain pd.Series — no per-row Python.

    Quantiles run over int64 CENTS with exact half-up rounding (see
    _IQR_ORACLE note): quartile interpolation over integers with
    frac ∈ {0,.25,.5,.75} is exact in float64, so Spark and DuckDB
    produce bit-identical doubles — no ulp-boundary flips."""

    @F.pandas_udf("double")
    def iqr(v: pd.Series) -> float:
        cents = (v * 100).round().astype("int64")
        d = cents.quantile(0.75) - cents.quantile(0.25)
        return math.floor(d + 0.5) / 100.0

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
            iqr("o_totalprice").alias("price_iqr"),
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
    # Bounded driver fit: point-query the top heavy-hitter CANDIDATES,
    # never an unbounded distinct key list (a high-cardinality key
    # column would otherwise collect millions of rows). TakeOrdered by
    # approximate frequency is a map-side top-k — no global sort.
    max_keys = 1000
    keys = [
        r.event_type
        for r in (
            ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "event_type")
            .limit(max_keys)
            .collect()
        )
    ]
    est = [(k, int(cms.estimateCount(k))) for k in sorted(keys)]
    return spark.createDataFrame(est, "event_type string, approx_n long")
