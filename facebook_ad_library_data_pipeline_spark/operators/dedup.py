"""Exact deduplication with keep-FIRST semantics (D1-D3).

Reference: three sequential ``drop_duplicates(subset=[k], keep="first")``
(``transform_raw_data.py:185-187``). Pandas keep-first is order-defined;
Spark's ``dropDuplicates`` keeps an *arbitrary* row, so parity requires
an explicit position ordering: ``row_number() OVER (PARTITION BY key
ORDER BY pos) = 1`` — one hash shuffle per dedup, scales linearly.

Null-key semantics replicated knowingly (SURVEY.md §2 D2): pandas (and
Spark window partitioning) group all NULL keys together, so only the
first null-key row survives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def dedup_keep_first(df: DataFrame, key_cols: list[str | Column], order_cols: list) -> DataFrame:
    """Generic keep-first dedup: one row_number window, filter rn=1.

    Single shuffle on the dedup key; at 100 TB this is the minimal-cost
    exact dedup (hash partition + per-partition sort on the tie-break).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


_DEDUP_PART_ORACLE = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
           row_number() OVER (PARTITION BY l_partkey
                              ORDER BY l_orderkey, l_linenumber) AS rn
    FROM lineitem
) WHERE rn = 1
"""


@query("q_dedup_keep_first", oracle=_DEDUP_PART_ORACLE, tags=("parity", "dedup"))
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: dedup lineitem on l_partkey, keep first in ingest order
    (orderkey, linenumber) — the reference's ad_id dedup shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return dedup_keep_first(
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        ["l_partkey"],
        ["l_orderkey", "l_linenumber"],
    )


_DEDUP_NULL_ORACLE = """
SELECT o_orderkey, group_key, o_totalprice
FROM (
    SELECT o_orderkey,
           nullif(o_orderpriority, '3-MEDIUM') AS group_key,
           o_totalprice,
           row_number() OVER (PARTITION BY nullif(o_orderpriority, '3-MEDIUM')
                              ORDER BY o_orderkey) AS rn
    FROM orders
) WHERE rn = 1
"""


@query("q_dedup_null_collapse", oracle=_DEDUP_NULL_ORACLE, tags=("parity", "dedup"))
def q_dedup_null_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: dedup on a NULLABLE key — all null-key rows collapse to the
    single first one (pandas semantics, replicated knowingly)."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("group_key"),
        "o_totalprice",
    )
    return dedup_keep_first(keyed, ["group_key"], ["o_orderkey"])


_DEDUP_TEXT_ORACLE = """
SELECT doc_id, text, source
FROM (
    SELECT doc_id, text, source,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn = 1
"""


@query("q_dedup_exact_text", oracle=_DEDUP_TEXT_ORACLE, tags=("parity", "dedup", "llm"))
def q_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: exact text dedup keep-first — hash-groupBy on the full text.

    At 100 TB you'd dedup on a digest (xxhash64/md5 of text) instead of
    shuffling full documents; see q_dedup_exact_digest."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_keep_first(
        docs.select("doc_id", "text", "source"), ["text"], ["doc_id"]
    )


_DEDUP_DIGEST_ORACLE = """
SELECT doc_id, md5(text) AS text_digest, n_chars
FROM (
    SELECT doc_id, text, n_chars,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn = 1
"""


@query("q_dedup_exact_digest", oracle=_DEDUP_DIGEST_ORACLE, tags=("dedup", "llm", "scale"))
def q_dedup_exact_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for D3: dedup on md5(text) so the shuffle carries a
    16-byte digest, not the document body."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_digest"), "n_chars")
    return dedup_keep_first(keyed, ["text_digest"], ["doc_id"])
