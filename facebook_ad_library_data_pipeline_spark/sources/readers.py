"""Readers — the reference's source surface (SURVEY.md §2: S6 JSON,
R1 Parquet) plus the formats a complete engine needs, every one with a
DECLARED schema (inference is allowed only in the schema-drift sidecar,
never on the hot path — SURVEY.md §1.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """R1 (generate_report.py:21). Columnar scan: predicate pushdown +
    column pruning come free from Catalyst."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, multi_line: bool = False
) -> DataFrame:
    """S6 (transform_raw_data.py:193-194). multi_line=True for
    pretty-printed whole-file arrays-of-objects (the scraper dumps with
    indent=2, collect_raw_data.py:198); line-delimited otherwise."""
    return spark.read.schema(schema).json(path, multiLine=multi_line)


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """S6 + the reference's row-level error swallowing (the try/except-
    continue at transform_raw_data.py:156-161) done declaratively:
    PERMISSIVE mode routes malformed records into a corrupt-record
    column instead of killing the job → (clean, corrupt) pair.

    Note Spark's contract: the corrupt-record column must be part of
    the read schema, and corrupt rows have every data column null."""
    corrupt_col = "_corrupt_record"
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    ).cache()
    clean = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = raw.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, corrupt


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with declared schema (header tolerated, never trusted for
    types)."""
    return spark.read.schema(schema).csv(path, header=True)


def infer_schema_sidecar(
    spark: SparkSession, path: str, fmt: str = "json", sampling_ratio: float = 1.0
) -> T.StructType:
    """Schema-DRIFT detector: infer and return the observed schema so
    callers can diff it against the declared one. The one sanctioned use
    of inference — point it at a bounded sample path (or lower
    sampling_ratio on big inputs), never the full hot path."""
    if fmt == "json":
        return spark.read.option("samplingRatio", sampling_ratio).json(path).schema
    if fmt == "csv":
        return spark.read.option("inferSchema", True).option("header", True).csv(path).schema
    raise ValueError(f"unsupported sidecar format: {fmt}")


def schema_drift(declared: T.StructType, observed: T.StructType) -> dict[str, list[str]]:
    """Field-level diff: what appeared, vanished, or changed type."""
    d = {f.name: f.dataType.simpleString() for f in declared.fields}
    o = {f.name: f.dataType.simpleString() for f in observed.fields}
    return {
        "added": sorted(set(o) - set(d)),
        "removed": sorted(set(d) - set(o)),
        "retyped": sorted(k for k in set(d) & set(o) if d[k] != o[k]),
    }


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same Catalyst pushdown/pruning path as parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
