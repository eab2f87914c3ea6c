"""Physical-plan regression tests: the scale properties (pushdown,
pruning, broadcast, top-k heap) must hold, not just the row values."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.plans.explain import (
    has_node,
    pushed_filters,
    scan_column_counts,
)
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_flagship_pushdown_and_pruning(spark, sf_dir):
    df = REGISTRY["q_flagship"].fn(spark, sf_dir)
    assert any("EqualTo(o_orderstatus,O)" in f for f in pushed_filters(df))
    # lineitem scan must read exactly the 3 referenced columns (of 11)
    assert sorted(scan_column_counts(df)) == [3, 4]


def test_q1_filter_reaches_scan(spark, sf_dir):
    df = REGISTRY["q_tpch_q1"].fn(spark, sf_dir)
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_dim_joins_broadcast(spark, sf_dir):
    df = REGISTRY["q_join_broadcast_dims"].fn(spark, sf_dir)
    assert has_node(df, "BroadcastHashJoin")
    assert not has_node(df, "SortMergeJoin")


def test_semi_anti_stay_semi_anti(spark, sf_dir):
    assert has_node(REGISTRY["q_join_semi"].fn(spark, sf_dir), "LeftSemi")
    assert has_node(REGISTRY["q_join_anti"].fn(spark, sf_dir), "LeftAnti")


def test_global_topk_never_full_sorts(spark, sf_dir):
    assert has_node(REGISTRY["q_topk_global"].fn(spark, sf_dir), "TakeOrderedAndProject")
    assert has_node(REGISTRY["q_flagship"].fn(spark, sf_dir), "TakeOrderedAndProject")


def test_inverted_index_join_not_broadcast(spark, sf_dir):
    # the exploded shingle self-join must shuffle, not broadcast
    df = REGISTRY["q_ngram_jaccard_pairs"].fn(spark, sf_dir)
    assert has_node(df, "ShuffledHashJoin")
