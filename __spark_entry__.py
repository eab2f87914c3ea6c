"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``facebook_ad_library_data_pipeline_spark``: every operator registers a
Spark query + colocated DuckDB oracle in the package registry
(``facebook_ad_library_data_pipeline_spark/registry.py``); this module re-exposes them in
the driver's shape. See SURVEY.md §2 for the operator inventory each
query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from facebook_ad_library_data_pipeline_spark.registry import load_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q_flagship"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
