"""Near-dup family semantics on real testdata + constructed fixtures:
MinHash estimates track exact Jaccard; LSH recalls the planted
near-dups; SimHash puts near-identical docs within small Hamming
distance and unrelated docs far apart."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.dedup_near import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_col,
)
from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.d1, r.d2): r.jaccard for r in jaccard_pairs(docs, 0.8).collect()
    }
    assert exact, "expected planted near-dup pairs at J>=0.8"
    est = {
        (r.d1, r.d2): r.est_jaccard
        for r in REGISTRY["q_minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    # every high-J pair must be recalled (P_miss < 1e-4 at J=0.8, K=32/8 bands)
    missed = [p for p in exact if p not in est]
    assert not missed, f"LSH missed planted pairs: {missed}"
    # and the estimator should be close (K=32 → se ~ sqrt(J(1-J)/32) ≈ 0.07)
    for p, j in exact.items():
        assert abs(est[p] - j) < 0.25, (p, est[p], j)


def test_neardup_dedup_drops_only_pair_losers(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    pairs = jaccard_pairs(docs, 0.6)
    losers = pairs.select("d2").distinct().count()
    kept = REGISTRY["q_neardup_dedup"].fn(spark, sf_dir).count()
    assert kept == n_docs - losers


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog again and again until done"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("lazy", "sleepy")),  # one-token change
            (3, "completely different words about spark shuffles and parquet scans"),
        ],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.simhash for r in simhash_col(docs).collect()}
    ham = lambda a, b: bin((fp[a] ^ fp[b]) & (2**64 - 1)).count("1")
    assert ham(1, 2) <= 16, f"near-dup hamming too high: {ham(1, 2)}"
    assert ham(1, 3) > 16, f"unrelated docs too close: {ham(1, 3)}"


def test_minhash_identical_docs_identical_sigs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r.sig) for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    cands = lsh_candidate_pairs(minhash_signatures(docs)).collect()
    est = {(r.d1, r.d2): r.est_jaccard for r in cands}
    assert est.get((1, 2)) == 1.0


def test_shingle_df_cap_bounds_hot_shingle_blowup(spark):
    """One shingle shared by MANY docs must not quadratically explode the
    candidate join: with the cap, pairs that ONLY share the hot shingle
    disappear, while genuinely near-dup pairs survive untouched."""
    hot = "click here now"  # one 3-gram every doc shares
    docs = [(i, f"{hot} unique{i} filler{i} tail{i} pad{i}") for i in range(1, 41)]
    # plus one planted true near-dup pair that shares most shingles
    docs += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = jaccard_pairs(df, 0.05, max_shingle_df=None)
    # every pair of the 40 hot docs shares the hot shingle → C(40,2) pairs
    assert uncapped.filter(F.col("d1") < 100).count() == 40 * 39 // 2
    capped = jaccard_pairs(df, 0.05, max_shingle_df=10)
    # hot-shingle-only pairs are gone...
    assert capped.filter(F.col("d1") < 100).count() == 0
    # ...and the planted near-dup pair survives with its exact score:
    # shingle sets of 100/101 share 5 of 6 3-grams (J = 5/7), none hot.
    survivors = {(r.d1, r.d2): r.jaccard for r in capped.collect()}
    assert (100, 101) in survivors
    assert abs(survivors[(100, 101)] - 5 / 7) < 1e-6


def test_shingle_cap_default_inactive_on_testdata(spark, sf_dir):
    """SHINGLE_DF_CAP must sit far above any real testdata df so the
    oracle-checked queries are unaffected by the cap. (Since r13 the
    cap is also REPLAYED by every oracle's shingle CTE, so a crossing
    could no longer flip a hash — but the cap's documentation promises
    results are cap-independent at test scale, and a regenerated
    fixture drifting toward the cap should fail loudly here first.)"""
    from facebook_ad_library_data_pipeline_spark.operators.dedup_near import (
        SHINGLE_DF_CAP,
        exploded_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    max_df = (
        exploded_shingles(docs)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .collect()[0]
        .m
    )
    assert max_df <= SHINGLE_DF_CAP // 4, (max_df, SHINGLE_DF_CAP)

