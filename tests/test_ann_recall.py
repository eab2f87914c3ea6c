"""Driver-visible ANN recall@10: shape, soundness, and quality floors.
The registered q_ann_recall emits only floor flags (oracle-pinned TRUE);
the raw overlap numbers asserted here come from ann_recall_detail."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.functions.ann_recall import ann_recall_detail


def test_ann_recall_rows_and_floors(spark, sf_dir):
    rows = {r.method: r for r in ann_recall_detail(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf", "ivf_pq"}
    for r in rows.values():
        assert r.n_returned == 10
        assert 0 <= r.n_overlap <= 10
        assert abs(r.recall_at_10 - r.n_overlap / 10) < 1e-9
    # quality floors mirror the per-index tests (test_ivf.py, test_pq.py):
    # IVF probes the 4 nearest of 16 cells -> high recall; PQ shortlist
    # re-ranked exactly keeps >=0.3; LSH single-bucket probe is the
    # weakest but must find SOMETHING on the fixture corpus.
    assert rows["ivf"].n_overlap >= 5
    assert rows["ivf_pq"].n_overlap >= 3
    assert rows["lsh"].n_overlap >= 1
