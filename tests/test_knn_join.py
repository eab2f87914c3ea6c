"""Batch kNN join: exact result shape, LSH subset + recall floor."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.functions.knn_join import KNN_K, KNN_QUERIES
from facebook_ad_library_data_pipeline_spark.registry import load_all


def test_knn_join_exact_shape(spark, sf_dir):
    rows = load_all()["q_knn_join"].fn(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(KNN_QUERIES))
    for q_id, nbrs in by_q.items():
        assert len(nbrs) == KNN_K
        assert sorted(r.rnk for r in nbrs) == list(range(1, KNN_K + 1))
        assert all(r.vec_id != q_id for r in nbrs)
        sims = [r.cos_sim for r in sorted(nbrs, key=lambda r: r.rnk)]
        assert sims == sorted(sims, reverse=True)


def test_knn_join_lsh_sound_and_recalls(spark, sf_dir):
    reg = load_all()
    exact = reg["q_knn_join"].fn(spark, sf_dir).collect()
    approx = reg["q_knn_join_lsh"].fn(spark, sf_dir).collect()
    exact_ids = {(r.q_id, r.vec_id) for r in exact}
    # soundness: every approx cos_sim matches the true cosine — compare
    # against the exact scored pairs where both were returned
    exact_sim = {(r.q_id, r.vec_id): r.cos_sim for r in exact}
    for r in approx:
        if (r.q_id, r.vec_id) in exact_sim:
            assert abs(r.cos_sim - exact_sim[(r.q_id, r.vec_id)]) < 1e-9
    # aggregate recall floor over the batch: multi-probe LSH must find
    # SOME of the true top-k across 8 queries (observed ~0.18 on the
    # 500-vector fixture where 9 probes cover ~5% of the corpus; the
    # floor leaves slack for driver testdata regeneration)
    hits = sum(1 for r in approx if (r.q_id, r.vec_id) in exact_ids)
    assert hits >= 2, f"batch recall too low: {hits}"
