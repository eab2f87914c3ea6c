"""Arrow-native extension APIs (mapInArrow / applyInArrow): kernel
semantics must agree with the SQL the oracles restate, and the two
queries must agree with their native-expression twins in-engine."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.functions.arrow_fns import (
    q_arrow_group_stats,
    q_arrow_token_stats,
)


def test_ws_token_kernel_matches_split_semantics():
    """count_substring(text, ' ') + 1 must equal the split-on-single-
    space piece count for the edge shapes that break naive tokenizers:
    empty string, runs of spaces (empty pieces COUNT, matching DuckDB's
    string_split and Spark's split), leading/trailing spaces."""
    tricky = ["", " ", "a", "a b", "a  b", " a b ", "a b  c   d"]
    arr = pa.array(tricky)
    kernel = pc.add(pc.count_substring(arr, " "), 1).to_pylist()
    python_split = [len(s.split(" ")) for s in tricky]
    assert kernel == python_split


def test_arrow_queries_match_native_twins(spark, sf_dir):
    """Engine-internal consistency, complementing the DuckDB oracle:
    the mapInArrow features and applyInArrow order statistics must
    equal the same aggregates computed with native Catalyst
    expressions (split/size/length, percentile for the exact median)."""
    docs = load_table(spark, sf_dir, "documents")

    native_tokens = (
        docs.select(
            "source",
            F.length("text").alias("n_chars_text"),
            F.size(F.split("text", " ", -1)).alias("ws_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_text").alias("sum_chars"),
            F.sum("ws_tokens").alias("sum_ws_tokens"),
        )
    )
    arrow_tokens = q_arrow_token_stats(spark, sf_dir)
    assert arrow_tokens.exceptAll(native_tokens).count() == 0
    assert native_tokens.exceptAll(arrow_tokens).count() == 0

    native_groups = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    arrow_groups = q_arrow_group_stats(spark, sf_dir)
    assert arrow_groups.exceptAll(native_groups).count() == 0
    assert native_groups.exceptAll(arrow_groups).count() == 0
