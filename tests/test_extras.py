"""Semantics tests for the extras: pandas-UDF lang equivalence,
stratified sample proportions, stateful streaming vs batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.registry import load_all

REGISTRY = load_all()


def test_lang_udf_matches_native_heuristic(spark, sf_dir):
    try:
        import langdetect  # noqa: F401

        return  # real langdetect present → values legitimately differ
    except ImportError:
        pass
    udf_rows = {
        r.doc_id: r.detected_lang
        for r in REGISTRY["q_lang_id_udf"].fn(spark, sf_dir).collect()
    }
    native = {
        r.doc_id: r.detected_lang for r in REGISTRY["q_lang_id"].fn(spark, sf_dir).collect()
    }
    assert udf_rows == native


def test_stratified_sample_downsamples_dominant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    orig = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    from facebook_ad_library_data_pipeline_spark.operators.extras import stratified_sample

    sampled = {
        r.lang: r.n
        for r in stratified_sample(spark, sf_dir)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # non-en strata kept whole; en downsampled to roughly a quarter
    for lang, n in orig.items():
        if lang == "en":
            assert sampled.get(lang, 0) < 0.6 * n
        else:
            assert sampled.get(lang, 0) == n


def test_stateful_stream_matches_batch_totals(spark, sf_dir):
    stream = {
        r.user_id: (r.n_events, r.total_value)
        for r in REGISTRY["q_stream_stateful_user"].fn(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.total, 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert stream == batch


def test_hll_partial_merge_accuracy(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = {r.scope: r for r in REGISTRY["q_hll_partial_merge"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    exact_all = o.select("o_custkey").distinct().count()
    assert rows["ALL"].exact_customers == exact_all
    # HLL default lgConfigK=12 → rsd ~1.6%; the approx_ok flag is the 5% gate
    assert all(r.approx_ok for r in rows.values()), rows
    exact_y = {str(r.y): r.n for r in o.groupBy(F.year("o_orderdate").alias("y"))
               .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    for y, n in exact_y.items():
        assert rows[y].exact_customers == n


def test_countmin_never_underestimates(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = {r.event_type: r
            for r in REGISTRY["q_countmin_heavy_hitters"].fn(spark, sf_dir).collect()}
    exact = {r.event_type: r.n
             for r in load_table(spark, sf_dir, "events").groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(rows) == set(exact)
    for k, n in exact.items():
        assert rows[k].exact_n == n
        assert rows[k].cms_sound  # est ≥ exact AND est ≤ exact + ε·N


def test_countmin_portable_sound_and_tight(spark, sf_dir):
    rows = REGISTRY["q_countmin_portable"].fn(spark, sf_dir).collect()
    assert rows, "no heavy hitters returned"
    for r in rows:
        assert r.cms_n >= r.exact_n          # CMS never underestimates
        # w=256 x 4 depths over <=1500 keys: collisions add at most a
        # few key-loads; a 3x blowup would mean the hash family broke
        assert r.cms_n <= r.exact_n * 3
