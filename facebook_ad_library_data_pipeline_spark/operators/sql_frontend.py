"""The SQL front end: the same engine surface through ``spark.sql``.

The reference has no query language at all (SURVEY.md §3 — a "query"
is a hard-coded imperative stage); everything else in this repo drives
Catalyst through the DataFrame API. These entries prove the identical
plans are reachable through ANSI SQL text over registered temp views —
which is how analysts would actually use the engine — and they land on
the same physical operators (codegen'd hash aggregate, broadcast join,
TakeOrderedAndProject) because both front ends meet in the same
logical-plan layer.

The oracle strings are near-verbatim the submitted SQL: the point of
the test is front-end fidelity, not translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query

_SQL_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q_sql_revenue_by_nation", oracle=_SQL_REVENUE_BY_NATION, tags=("sql", "join", "agg"))
def q_sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL multiway join + aggregate over temp views; the oracle
    is the same text run by DuckDB. nation auto-broadcasts (under the
    10 MB threshold) without hints — the SQL front end inherits every
    Catalyst physical strategy."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_REVENUE_BY_NATION)


_SQL_TOP_CUSTOMER_PER_SEGMENT = """
SELECT c_mktsegment, c_custkey, total_spend
FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_spend,
         row_number() OVER (
             PARTITION BY c_mktsegment
             ORDER BY sum(CAST(o_totalprice AS DECIMAL(18,6))) DESC, c_custkey
         ) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment, c_custkey
) ranked
WHERE rn <= 3
ORDER BY c_mktsegment, total_spend DESC, c_custkey
"""


@query(
    "q_sql_top_customer_per_segment",
    oracle=_SQL_TOP_CUSTOMER_PER_SEGMENT,
    tags=("sql", "window", "topk"),
)
def q_sql_top_customer_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL window-over-aggregate (top-3 spenders per segment) with a
    c_custkey tie-break so row_number is total-ordered — the same
    determinism rule every DataFrame-side window query here follows."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_TOP_CUSTOMER_PER_SEGMENT)


_SQL_CTE_YOY = """
WITH yearly AS (
  SELECT year(o_orderdate) AS order_year,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY year(o_orderdate)
)
SELECT order_year,
       revenue,
       round(revenue - lag(revenue) OVER (ORDER BY order_year), 2) AS yoy_delta
FROM yearly
ORDER BY order_year
"""


@query("q_sql_cte_yoy", oracle=_SQL_CTE_YOY, tags=("sql", "window", "agg"))
def q_sql_cte_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + lag window (year-over-year revenue delta) in pure SQL.
    The single-partition window is fine HERE because `yearly` is
    year-cardinality (≤ 10 rows) — the same pattern over a fact table
    would need a partition key."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_CTE_YOY)


_SQL_LATERAL_LATEST = """
SELECT c_custkey, c_mktsegment, o.o_orderkey AS latest_orderkey,
       o.o_orderdate AS latest_orderdate, round(o.o_totalprice, 2) AS latest_totalprice
FROM customer,
LATERAL (
  SELECT o_orderkey, o_orderdate, o_totalprice
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o
ORDER BY c_custkey
"""


@query("q_sql_lateral_latest_order", oracle=_SQL_LATERAL_LATEST, tags=("sql", "lateral", "topk"))
def q_sql_lateral_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (latest order per customer) — the
    per-row-subquery front-end shape. Catalyst decorrelates it to a
    window/aggregate join, NOT an O(customers × orders) nested loop;
    (o_orderdate, o_orderkey) DESC makes the pick total-ordered so both
    engines choose the same row."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_LATERAL_LATEST)


_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
HAVING count(*) > 10
"""


@query("q_sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "agg"))
def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same filter→aggregate→having chain through Spark 4's SQL
    PIPE syntax (`FROM t |> WHERE |> AGGREGATE |> WHERE`) — operators
    compose top-to-bottom in execution order instead of SQL's
    inside-out clause nesting. Must hit identical physical plans and
    identical results as the ANSI form: pipe syntax is sugar over the
    same logical plan, which the shared oracle proves."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderpriority
        |> WHERE n > 10
        """
    )
