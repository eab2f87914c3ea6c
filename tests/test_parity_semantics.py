"""Unit tests for the nasty reference semantics on constructed frames:
banker's rounding (R6), keep-first dedup incl. null-key collapse
(D1/D2), validation split partition (V1/V2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.dedup import dedup_keep_first
from facebook_ad_library_data_pipeline_spark.operators.report import hours_passed
from facebook_ad_library_data_pipeline_spark.operators.quality import (
    validation_error_column,
)


def test_bround_half_even(spark):
    # pandas .round(0) parity: 0.5→0, 1.5→2, 2.5→2, 3.5→4 (hours in seconds)
    df = spark.createDataFrame(
        [(1800,), (5400,), (9000,), (12600,), (4000,)], "seconds long"
    )
    got = {
        r.seconds: r.h
        for r in df.select("seconds", hours_passed(F.col("seconds")).alias("h")).collect()
    }
    assert got == {1800: 0, 5400: 2, 9000: 2, 12600: 4, 4000: 1}


def test_dedup_keep_first_order(spark):
    df = spark.createDataFrame(
        [("k1", 2, "second"), ("k1", 1, "first"), ("k2", 5, "only")],
        "key string, pos int, tag string",
    )
    out = dedup_keep_first(df, ["key"], ["pos"]).collect()
    assert sorted((r.key, r.tag) for r in out) == [("k1", "first"), ("k2", "only")]


def test_dedup_null_keys_collapse(spark):
    # pandas drop_duplicates collapses ALL null keys to the first one
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("a", 3), (None, 4)], "key string, pos int"
    )
    out = dedup_keep_first(df, ["key"], ["pos"]).collect()
    assert sorted(((r.key, r.pos) for r in out), key=str) == sorted(
        [(None, 1), ("a", 3)], key=str
    )


def test_validation_split_partitions_input(spark):
    df = spark.createDataFrame([(1, 10.0), (2, -1.0), (3, 500.0)], "id int, v double")
    rules = [("neg", F.col("v") >= 0), ("big", F.col("v") < 250)]
    d = df.withColumn("err", validation_error_column(rules))
    valid = d.filter(F.col("err").isNull()).count()
    invalid = {r.id: r.err for r in d.filter(F.col("err").isNotNull()).collect()}
    assert valid == 1
    assert invalid == {2: "neg", 3: "big"}


def test_validation_error_joins_multiple(spark):
    df = spark.createDataFrame([(1, -500.0)], "id int, v double")
    rules = [("neg", F.col("v") >= 0), ("big", F.col("v") > -600), ("huge", F.col("v") > -400)]
    err = df.withColumn("err", validation_error_column(rules)).collect()[0].err
    assert err == "neg; huge"
