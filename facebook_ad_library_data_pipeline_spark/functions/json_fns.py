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
