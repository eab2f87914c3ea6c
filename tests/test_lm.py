"""Unit edges for the bigram-LM quality scorer (functions/lm.py): the
oracle sweep proves the corpus-level hash; these pin the per-doc
bigram extraction on boundary shapes the testdata never exercises."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.functions.lm import LM_SCALE, _bigrams


def test_bigrams_boundary_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c"),   # 2 transitions
            (2, "solo"),    # 1 token -> no transitions
            (3, ""),        # split('') -> [''] -> no transitions
            (4, "x x"),     # repeated token, 1 transition
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["w1"], r["w2"]) for r in _bigrams(df).collect()
    )
    assert rows == [(1, "a", "b"), (1, "b", "c"), (4, "x", "x")]


def test_lm_scaled_probability_is_exact_integer(spark):
    """The whole-pipeline fold on a corpus small enough to hand-check:
    corpus 'a b' + 'a b a' -> bigrams (a,b)x2, (b,a)x1; prefix a:2 b:1;
    V=2. p(a->b) = (2+1)/(2+2), p(b->a) = (1+1)/(1+2) — scaled by 1e9
    with integer floor division."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b a")], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    bi = _bigrams(df)
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    prefix = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("cp"))
    v = 2
    scored = (
        bi.join(counts, ["w1", "w2"])
        .join(prefix, ["w1"])
        .withColumn("p", F.expr(f"({LM_SCALE} * (c + 1)) div (cp + {v})"))
    )
    got = {
        (r["doc_id"], r["w1"], r["w2"]): r["p"] for r in scored.collect()
    }
    p_ab = LM_SCALE * 3 // 4
    p_ba = LM_SCALE * 2 // 3
    assert got == {
        (1, "a", "b"): p_ab,
        (2, "a", "b"): p_ab,
        (2, "b", "a"): p_ba,
    }
