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

def test_subqueries_decorrelate_to_joins(spark, sf_dir):
    # EXISTS/NOT EXISTS must become semi/anti joins, never per-row probes
    assert has_node(REGISTRY["q_subquery_exists"].fn(spark, sf_dir), "LeftSemi")
    assert has_node(REGISTRY["q_subquery_not_exists"].fn(spark, sf_dir), "LeftAnti")
    assert has_node(REGISTRY["q_subquery_in"].fn(spark, sf_dir), "LeftSemi")


def test_corr_scalar_subquery_becomes_agg_join(spark, sf_dir):
    df = REGISTRY["q_subquery_corr_scalar"].fn(spark, sf_dir)
    # decorrelated: an aggregate feeding a join on the correlation key
    assert has_node(df, "HashAggregate")
    assert has_node(df, "Join") or has_node(df, "HashJoin")


def test_q3_topk_heap_and_segment_pushdown(spark, sf_dir):
    df = REGISTRY["q_tpch_q3"].fn(spark, sf_dir)
    assert has_node(df, "TakeOrderedAndProject")
    assert any("c_mktsegment" in f for f in pushed_filters(df))
