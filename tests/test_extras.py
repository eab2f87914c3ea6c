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
    sampled = {
        r.lang: r.n
        for r in REGISTRY["q_sample_stratified"].fn(spark, sf_dir)
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
