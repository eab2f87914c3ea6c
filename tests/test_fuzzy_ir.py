"""Semantics fixtures for the round-6 operators: the FastSS edit-1
join (insertion/deletion arm the customer-name data can't exercise),
BM25 ranking sanity, and the column profiler's shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.fuzzy import edit1_pairs
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_edit1_pairs_all_edit_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "spark", "a"),
            (2, "spork", "b"),   # substitution of 1
            (3, "sparks", "c"),  # insertion vs 1
            (4, "spar", "d"),    # deletion vs 1
            (5, "spark", "e"),   # identical to 1 → distance 0, excluded
            (6, "spoak", "f"),   # distance 2 from 1, 1 from 2
            (7, "zzzzz", "g"),   # unrelated
        ],
        "k long, name string, seg string",
    )
    pairs = {
        (r.k1, r.k2) for r in edit1_pairs(df, "k", "name", "seg").collect()
    }
    assert (1, 2) in pairs  # substitution
    assert (1, 3) in pairs  # insertion
    assert (1, 4) in pairs  # deletion
    assert (2, 6) in pairs  # substitution elsewhere
    assert (1, 5) not in pairs  # identical strings are distance 0
    assert (1, 6) not in pairs  # distance 2
    assert not any(7 in p for p in pairs)
    # symmetric dupes never appear: k1 < k2 throughout
    assert all(k1 < k2 for k1, k2 in pairs)


def test_fuzzy_join_counts_positive(spark, sf_dir):
    rows = REGISTRY["q_fuzzy_join_edit1"].fn(spark, sf_dir).collect()
    assert rows, "customer names should contain edit-1 digit neighbors"
    assert all(r.n_pairs > 0 for r in rows)


def test_bm25_rare_term_dominates(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.catalog import load_table
    from facebook_ad_library_data_pipeline_spark.functions.ir import BM25_QUERY

    rows = REGISTRY["q_bm25_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r.rnk for r in rows] == list(range(1, 11))
    # the rare query term drives idf: every top doc must contain it
    rare = BM25_QUERY[0]
    docs = load_table(spark, sf_dir, "documents")
    top_ids = [r.doc_id for r in rows]
    with_rare = {
        r.doc_id
        for r in docs.filter(F.col("doc_id").isin(top_ids))
        .filter(F.array_contains(F.split("text", " "), rare))
        .collect()
    }
    assert with_rare == set(top_ids)


def test_profile_columns_shape(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.catalog import load_table
    from facebook_ad_library_data_pipeline_spark.operators.profile import PROFILE_COLUMNS

    rows = {r.col_name: r for r in REGISTRY["q_profile_columns"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(PROFILE_COLUMNS)
    n = load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
    # keys are unique; status is low-cardinality
    assert rows["o_orderkey"].n_distinct == n - rows["o_orderkey"].n_nulls
    assert rows["o_orderstatus"].n_distinct <= 5


def test_zorder_tiles_bound_both_dims(spark, sf_dir):
    # each z-bucket is a 64×64 tile: spans ≤ 63 in BOTH dims — the
    # property that makes min/max stats skipping work on either column.
    rows = REGISTRY["q_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.zbucket < 16
        assert r.x_max - r.x_min <= 63
        assert r.y_max - r.y_min <= 63
