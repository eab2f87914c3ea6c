"""JSON extraction — the reference's raw zone is nested JSON parsed by
hand-rolled recursion (``collect_raw_data.py:49-62``); with a known
schema that collapses to ``from_json`` / ``get_json_object``
(SURVEY.md §2 S2 mapping). Exercised on events.props.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import query

PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

_JSON_EXTRACT_ORACLE = """
SELECT event_id,
       event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


@query("q_json_extract", oracle=_JSON_EXTRACT_ORACLE, tags=("json", "scalar"))
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (never schema_of_json on the hot
    path — that's an extra pass)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("k"),
    )


_JSON_AGG_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
GROUP BY event_type
"""


@query("q_json_filter_agg", oracle=_JSON_AGG_ORACLE, tags=("json", "agg"))
def q_json_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + aggregate on an extracted JSON field — the parsed struct
    is projected once and reused (Catalyst dedups the from_json)."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", PROPS_SCHEMA).getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# ------------------------------------------------- VARIANT (Spark 4)

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
"""


@query("q_variant_json", oracle=_VARIANT_ORACLE, tags=("json", "scalar", "agg"))
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed path
    extraction (variant_get with a target type) WITHOUT declaring a
    schema up front — the ingestion posture for payloads whose shape
    drifts (vs q_json_extract's declared-schema from_json, which is
    the right call once the shape is known). A missing path yields
    NULL, not an error — counted here to pin that semantic. At 100 TB
    the win is parse-once: the variant column stores pre-parsed binary,
    so N downstream extractions don't re-tokenize the JSON text N
    times. Oracle: DuckDB replays the same paths over the JSON text."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("variant_get(v, '$.k', 'long')")).alias("sum_k"),
        F.sum(
            F.when(F.expr("variant_get(v, '$.missing', 'string')").isNull(), 1).otherwise(0)
        ).alias("n_missing"),
    )


# ---------------------------------------------------------- XML extract

_XML_ORACLE = """
SELECT c_mktsegment AS segment,
       count(*) AS n,
       CAST(sum(c_custkey) AS BIGINT) AS sum_keys,
       CAST(sum(c_nationkey) AS BIGINT) AS sum_nations
FROM customer
"""


@query("q_xml_extract", oracle=_XML_ORACLE + "GROUP BY c_mktsegment", tags=("xml", "scalar"))
def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (`from_xml`, Spark 4's XML scalar
    function): serialize each customer into an XML fragment, parse it
    back with a declared schema, and aggregate the PARSED fields — a
    full encode→parse round trip whose oracle computes the same rollup
    straight from the source columns, so any parse loss (dropped
    element, type coercion, entity mangling) shifts a sum. All
    JVM-side expressions (concat + from_xml), scan-side map at 100 TB
    — the shape for ingesting XML feeds (sitemaps, legacy exports)
    without a preprocessing hop."""
    cust = load_table(spark, sf_dir, "customer")
    xml = F.concat(
        F.lit("<c><k>"), F.col("c_custkey"),
        F.lit("</k><n>"), F.col("c_nationkey"),
        F.lit("</n><seg>"), F.col("c_mktsegment"), F.lit("</seg></c>"),
    )
    parsed = cust.select(
        F.from_xml(xml, "k BIGINT, n BIGINT, seg STRING").alias("x")
    ).select("x.*")
    return parsed.groupBy(F.col("seg").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_keys"),
        F.sum("n").alias("sum_nations"),
    )
