"""Writers — the reference's sink surface (SURVEY.md §2: S5 raw JSON,
R10 report CSV, Parquet curated) with the scale-correct layouts:

* curated Parquet partitioned by a low-cardinality column (partition
  pruning on read; the reference writes one flat file,
  transform_raw_data.py:231);
* quarantine JSON (the invalid-records side output,
  transform_raw_data.py:205-214);
* report CSV coalesced to ONE file — legitimate only because a top-k
  report is ≤k rows (generate_report.py:50-54); never coalesce(1) a
  fact table.

Parameterized paths replace the reference's timestamped-name helper —
whose bug (returns the literal 'filename_<ts>', dropping its argument,
utils/base.py:4-8) we do not replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_quarantine_json(invalid: DataFrame, path: str, mode: str = "overwrite") -> None:
    """V2 side output: line-delimited JSON with the validation_error
    column — splittable/appendable, unlike the reference's single
    pretty-printed file."""
    invalid.write.mode(mode).json(path)


def write_report_csv(report: DataFrame, path: str, mode: str = "overwrite") -> None:
    """R10: single-file CSV with header; coalesce(1) is safe for a
    ≤10-row report only."""
    report.coalesce(1).write.mode(mode).option("header", True).csv(path)


def write_raw_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 mapping: raw-zone landing as line-delimited JSON."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """ORC sink (beyond the reference's JSON/Parquet/CSV surface):
    Spark-native columnar alternative with the same pushdown/pruning
    behavior as parquet; included so a warehouse standardized on ORC
    can consume the curated zone directly."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
