"""Query registry: one place where a Spark query and its DuckDB oracle
are declared together, so column names/aliases can never drift apart
(the driver's compare sorts columns by name before hashing values).

Usage::

    @query("q_topk", oracle="SELECT ... AS revenue ... LIMIT 10")
    def q_topk(spark, sf_dir):
        return ...DataFrame...

Queries without an ``oracle`` get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops: LSH, streaming,
pandas-UDF feature extraction).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import (ordered: parity → relational
# → llm-data → streaming).
_QUERY_MODULES = [
    "facebook_ad_library_data_pipeline_spark.operators.flagship",
    "facebook_ad_library_data_pipeline_spark.operators.transform",
    "facebook_ad_library_data_pipeline_spark.operators.quality",
    "facebook_ad_library_data_pipeline_spark.operators.dedup",
    "facebook_ad_library_data_pipeline_spark.operators.report",
    "facebook_ad_library_data_pipeline_spark.operators.joins",
    "facebook_ad_library_data_pipeline_spark.operators.aggregates",
    "facebook_ad_library_data_pipeline_spark.operators.windows",
    "facebook_ad_library_data_pipeline_spark.operators.setops",
    "facebook_ad_library_data_pipeline_spark.operators.asof",
    "facebook_ad_library_data_pipeline_spark.functions.scalars",
    "facebook_ad_library_data_pipeline_spark.functions.json_fns",
    "facebook_ad_library_data_pipeline_spark.functions.text",
    "facebook_ad_library_data_pipeline_spark.functions.similarity",
    "facebook_ad_library_data_pipeline_spark.operators.dedup_near",
    "facebook_ad_library_data_pipeline_spark.operators.extras",
    "facebook_ad_library_data_pipeline_spark.operators.subqueries",
    "facebook_ad_library_data_pipeline_spark.operators.tpch",
    "facebook_ad_library_data_pipeline_spark.operators.sketches",
    "facebook_ad_library_data_pipeline_spark.operators.sql_frontend",
    "facebook_ad_library_data_pipeline_spark.operators.cdc",
    "facebook_ad_library_data_pipeline_spark.operators.skew",
    "facebook_ad_library_data_pipeline_spark.operators.timeseries",
    "facebook_ad_library_data_pipeline_spark.operators.curation",
    "facebook_ad_library_data_pipeline_spark.operators.components",
    "facebook_ad_library_data_pipeline_spark.functions.arrays",
    "facebook_ad_library_data_pipeline_spark.functions.ivf",
    "facebook_ad_library_data_pipeline_spark.streaming.events",
    "facebook_ad_library_data_pipeline_spark.streaming.joins",
    "facebook_ad_library_data_pipeline_spark.streaming.stateful",
    "facebook_ad_library_data_pipeline_spark.multimodal.media",
]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate only the listed module itself being absent
            # (incremental build); never mask a broken transitive import.
            if e.name != mod:
                raise
    return REGISTRY
