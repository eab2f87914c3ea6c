"""Semantics of the round-5 additions: Bloom pruning guarantees and
funnel step ordering (oracle equality is covered by the registry sweep;
these pin the properties that make the operators trustworthy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_bloom_no_false_negatives_and_reconciles(spark, sf_dir):
    rows = REGISTRY["q_bloom_prefilter"].fn(spark, sf_dir).collect()
    assert rows, "no order statuses"
    for r in rows:
        # Bloom can only over-approximate the exact semi-join
        assert r.n_candidates >= r.n_exact, r
        assert r.n_false_pos == r.n_candidates - r.n_exact, r
        assert r.n_probe >= r.n_candidates, r


def test_bloom_bits_table_is_bounded(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.catalog import load_table
    from facebook_ad_library_data_pipeline_spark.operators.bloom import (
        BLOOM_M,
        bloom_bits,
    )

    customer = load_table(spark, sf_dir, "customer")
    bits = bloom_bits(customer.select("c_custkey"), "c_custkey")
    # the broadcastable-by-construction bound: never more than M/32 words
    assert bits.count() <= BLOOM_M // 32


def test_funnel_steps_strictly_ordered(spark, sf_dir):
    rows = REGISTRY["q_funnel_steps"].fn(spark, sf_dir).collect()
    assert rows
    completed = 0
    for r in rows:
        assert r.first_view is not None  # only users with a view appear
        if r.first_click is not None:
            assert r.first_click > r.first_view
        if r.first_purchase is not None:
            completed += 1
            assert r.completed
            assert r.first_click is not None
            assert r.first_purchase > r.first_click
        else:
            assert not r.completed
    assert 0 < completed <= len(rows)
