"""Similarity-search semantics: ANN structural guarantees + planted
near-identical vector recall; multimodal feature determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.functions.similarity import (
    QUERY_VEC_ID,
    bucket_col,
    cosine,
)
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_ann_results_subset_of_bruteforce_ordering(spark, sf_dir):
    brute = REGISTRY["q_embedding_topk"].fn(spark, sf_dir).collect()
    ann = REGISTRY["q_ann_lsh_topk"].fn(spark, sf_dir).collect()
    assert len(ann) <= 10
    # ANN scores are genuine cosines: each must appear in the brute-force
    # ordering no better than its own rank
    sims = [r.cos_sim for r in ann]
    assert sims == sorted(sims, reverse=True)
    assert ann, "query bucket empty — LSH bucketing degenerate"


def test_ann_finds_planted_duplicate(spark):
    # a vector identical to the query lands in the same bucket by
    # construction and must be retrieved with cosine ≈ 1
    base = [float((i * 37) % 19 - 9) for i in range(64)]
    rows = [(QUERY_VEC_ID, base, 0), (1, list(base), 0),
            (2, [float(-v) for v in base], 1)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")
    e = e.withColumn("bucket", bucket_col("emb"))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    got = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select("vec_id", F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cos_sim"))
        .collect()
    )
    by_id = {r.vec_id: r.cos_sim for r in got}
    assert by_id.get(1) == 1.0, f"planted duplicate not retrieved: {by_id}"
    assert 2 not in by_id, "antipodal vector must land in the complement bucket"


def test_bucket_stats_cover_all_vectors(spark, sf_dir):
    stats = REGISTRY["q_ann_bucket_stats"].fn(spark, sf_dir).collect()
    from facebook_ad_library_data_pipeline_spark.catalog import load_table

    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in stats) == total
    assert all(0 <= r.bucket < 256 for r in stats)


def test_multimodal_features_deterministic(spark, sf_dir):
    a = REGISTRY["q_multimodal_features"].fn(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    b = REGISTRY["q_multimodal_features"].fn(spark, sf_dir).orderBy("doc_id").limit(20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert abs(sum(r[f"hist_{i}"] for i in range(16)) - 1.0) < 1e-9
        assert r.n_bytes > 0
