"""Column profiling — the data-quality census every ingestion pipeline
runs before trusting a new drop: per-column null counts and exact
distinct cardinality in one relational statement.

Beyond-reference surface (the reference's only profiling is the row
counts it logs — SURVEY.md U2); complements the row-level validation
split (operators/quality.py) with column-level statistics.

Shape: ONE aggregate over the table computing every column's stats,
then an unpivot (``stack``) of the single result row into one row per
column — the table is scanned exactly once. The multiple exact
COUNT(DISTINCT)s expand the aggregate input ×#columns (Spark's Expand
operator); that is the honest cost of exact cardinality and what makes
the oracle checkable. At 100 TB you swap each ``countDistinct`` for
``approx_count_distinct`` (same plan minus the Expand; HLL partials
merge map-side) and keep the tolerance-flag pattern of
q_approx_distinct for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

PROFILE_COLUMNS = (
    "o_custkey",
    "o_orderdate",
    "o_orderkey",
    "o_orderpriority",
    "o_orderstatus",
    "o_totalprice",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
    f" count(*) - count({c}) AS n_nulls,"
    f" count(DISTINCT {c}) AS n_distinct FROM orders"
    for c in PROFILE_COLUMNS
) + "\nORDER BY col_name"


@query("q_profile_columns", oracle=_PROFILE_ORACLE, tags=("agg", "profile", "quality"))
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table: row count, null count,
    exact distinct count. One scan, one aggregate, stack-unpivoted to
    a row per column."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct" for c in PROFILE_COLUMNS
    )
    return (
        row.select(
            "n_rows",
            F.expr(
                f"stack({len(PROFILE_COLUMNS)}, {stack_args})"
                " AS (col_name, n_nulls, n_distinct)"
            ),
        )
        .select("col_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("col_name")
    )
