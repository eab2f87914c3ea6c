"""Projection / derivation operators — parity with the reference's
transform stage re-expressed on the testdata star schema.

Reference ops covered (SURVEY.md §2.A):
* P3 flat projection/rename (``transform_raw_data.py:106-148``)
* P4 running max within group — the reference computes a *prefix* max
  in group order, not the group max (``transform_raw_data.py:114-116``)
* P5 conditional classification via chained when/otherwise
  (``transform_raw_data.py:73-103``)
* P6 nested text extraction with fallback (``transform_raw_data.py:121-131``)

All native column expressions — whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_PROJECT_ORACLE = """
SELECT o_orderkey                    AS order_id,
       CAST(o_custkey AS VARCHAR)    AS customer_id,
       upper(o_orderpriority)        AS priority,
       o_totalprice                  AS total_price,
       o_orderdate                   AS order_ts
FROM orders
"""


@query("q_project_rename", oracle=_PROJECT_ORACLE, tags=("parity", "projection"))
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: select + alias + cast — column-pruned straight out of the scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.upper("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderdate").alias("order_ts"),
    )


_RUNNING_MAX_ORACLE = """
SELECT l_orderkey,
       l_linenumber,
       l_quantity,
       max(l_quantity) OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_max_qty
FROM lineitem
"""


@query("q_running_max", oracle=_RUNNING_MAX_ORACLE, tags=("parity", "window"))
def q_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: prefix max in group order (NOT the group max) — one shuffle
    on the partition key; position column = l_linenumber plays the role
    of the reference's ingest order.

    RANGE (not ROWS) frame: (l_orderkey, l_linenumber) is not unique in
    the testdata, and a ROWS frame over a non-total order is
    engine/shuffle-order-dependent. RANGE includes peer rows → the
    result is deterministic under Spark's unordered shuffles. (The
    reference's own position key was unique by construction —
    posexplode order; with a unique key ROWS ≡ RANGE.)"""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.max("l_quantity").over(w).alias("running_max_qty"),
    )


_CLASSIFY_ORACLE = """
SELECT p_partkey,
       p_type,
       p_size,
       CASE
           WHEN p_type = 'PROMO' THEN 'promo'
           WHEN p_type = 'ECONOMY' THEN 'economy'
           WHEN p_size >= 40 THEN 'bulky'
           WHEN p_size >= 20 THEN 'medium'
           ELSE 'compact'
       END AS part_class,
       CASE
           WHEN p_name LIKE '%widget%' AND p_name LIKE '%small%' THEN 'small-widget'
           WHEN p_name LIKE '%widget%' THEN 'widget'
           WHEN p_name LIKE '%bolt%' OR p_name LIKE '%rod%' THEN 'hardware'
           ELSE 'other'
       END AS name_class
FROM part
"""


@query("q_classify", oracle=_CLASSIFY_ORACLE, tags=("parity", "case"))
def q_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: chained when/otherwise folding multiple predicates into an
    enum — the media_mix classification shape (two booleans → 4-way)."""
    part = load_table(spark, sf_dir, "part")
    part_class = (
        F.when(F.col("p_type") == "PROMO", "promo")
        .when(F.col("p_type") == "ECONOMY", "economy")
        .when(F.col("p_size") >= 40, "bulky")
        .when(F.col("p_size") >= 20, "medium")
        .otherwise("compact")
    )
    name_class = (
        F.when(F.col("p_name").contains("widget") & F.col("p_name").contains("small"), "small-widget")
        .when(F.col("p_name").contains("widget"), "widget")
        .when(F.col("p_name").contains("bolt") | F.col("p_name").contains("rod"), "hardware")
        .otherwise("other")
    )
    return part.select(
        "p_partkey",
        "p_type",
        "p_size",
        part_class.alias("part_class"),
        name_class.alias("name_class"),
    )


_FALLBACK_ORACLE = """
SELECT doc_id,
       coalesce(
           CASE WHEN lang IN ('de', 'fr')
                THEN string_split(text, ' ')[1]
                ELSE substring(text, 1, 12) END,
           '') AS lead_text,
       CASE WHEN length(text) >= 1 THEN string_split(text, ' ')[1] ELSE '' END AS first_token
FROM documents
"""


@query("q_text_fallback", oracle=_FALLBACK_ORACLE, tags=("parity", "nested"))
def q_text_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: conditional element extraction with coalesce-to-'' fallback —
    the DCO/CAROUSEL card[0].body vs body.text shape, on array-of-token
    columns (element_at is 1-based, like the SQL oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lead = F.coalesce(
        F.when(F.col("lang").isin("de", "fr"), F.element_at(toks, 1)).otherwise(
            F.substring("text", 1, 12)
        ),
        F.lit(""),
    )
    first = F.when(F.length("text") >= 1, F.element_at(toks, 1)).otherwise(F.lit(""))
    return docs.select("doc_id", lead.alias("lead_text"), first.alias("first_token"))
