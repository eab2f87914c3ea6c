"""Array/collection function pack — the column-type surface the LLM
pipeline lives on (token arrays, embeddings, shingle sets), all
JVM-side higher-order functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_ARRAY_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks)                                   AS n_tokens,
       len(list_distinct(toks))                    AS n_distinct,
       list_sort(list_distinct(toks))[1]           AS first_token_sorted,
       list_contains(toks, 'spark')                AS mentions_spark,
       len(list_filter(toks, x -> length(x) > 4))  AS n_long_tokens,
       list_sort(list_transform(list_distinct(toks), x -> upper(x)))[1] AS first_upper
FROM t
"""


@query("q_array_pack", oracle=_ARRAY_ORACLE, tags=("scalar", "array", "llm"))
def q_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_distinct / sort_array / array_contains / filter /
    transform over token arrays."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(F.sort_array(F.array_distinct(toks)), 1).alias("first_token_sorted"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.element_at(
            F.sort_array(F.transform(F.array_distinct(toks), lambda x: F.upper(x))), 1
        ).alias("first_upper"),
    )


_VEC_ORACLE = """
SELECT vec_id,
       round(list_aggregate(embedding::DOUBLE[], 'sum'), 6)            AS vec_sum,
       round(list_aggregate(embedding::DOUBLE[], 'min'), 6)            AS vec_min,
       round(list_aggregate(embedding::DOUBLE[], 'max'), 6)            AS vec_max,
       round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x),
                                 'sum')), 6)                            AS vec_norm,
       len(list_filter(embedding::DOUBLE[], x -> x > 0))               AS n_positive
FROM embeddings
"""


@query("q_vector_stats", oracle=_VEC_ORACLE, tags=("scalar", "array", "similarity"))
def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector statistics via aggregate/transform folds (double
    precision, sequential fold = DuckDB's list_aggregate order)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    fsum = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    sq = F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.round(fsum, 6).alias("vec_sum"),
        F.round(F.array_min(v), 6).alias("vec_min"),
        F.round(F.array_max(v), 6).alias("vec_max"),
        F.round(F.sqrt(sq), 6).alias("vec_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
    )


_MAP_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


@query("q_map_from_json", oracle=_MAP_ORACLE, tags=("scalar", "map", "json"))
def q_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType → element access: the dynamic-properties pattern
    when the props schema is open-ended (vs the closed-struct
    q_json_extract)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        # try_element_at: plain element_at on a missing map key throws
        # under ANSI mode
        e.select("event_type", F.try_element_at(m, F.lit("k")).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_total"),
        )
    )
