"""Property-based tests (hypothesis) — SURVEY.md §5.4: algebraic
invariants that must hold for ANY input, not just the fixtures.

Each example builds a small in-memory DataFrame; examples are capped
(Spark-job cost per example ≈ 100 ms) and deadline disabled — the
properties are about semantics, not speed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.operators.dedup import dedup_keep_first
from facebook_ad_library_data_pipeline_spark.operators.quality import (
    validation_error_column,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # key (collides often)
        st.one_of(st.none(), st.integers(0, 3)),          # nullable key
        st.integers(min_value=-100, max_value=100),       # value
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_keep_first_idempotent_and_first_wins(spark, rows):
    df = spark.createDataFrame(
        [(i, k, nk, v) for i, (k, nk, v) in enumerate(rows)],
        "pos long, k long, nk long, v long",
    )
    once = dedup_keep_first(df, ["k"], ["pos"])
    twice = dedup_keep_first(once, ["k"], ["pos"])
    got = sorted(tuple(r) for r in once.collect())
    # idempotence
    assert sorted(tuple(r) for r in twice.collect()) == got
    # exactly one survivor per key, and it is the first by pos
    expected = {}
    for i, (k, nk, v) in enumerate(rows):
        if k not in expected:
            expected[k] = (i, k, nk, v)
    assert got == sorted(expected.values())


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_null_keys_collapse_like_pandas(spark, rows):
    # D2 semantics (SURVEY.md §2.A): null keys form ONE group — only
    # the first null-key row survives, replicating pandas keep="first".
    df = spark.createDataFrame(
        [(i, k, nk, v) for i, (k, nk, v) in enumerate(rows)],
        "pos long, k long, nk long, v long",
    )
    got = dedup_keep_first(df, ["nk"], ["pos"]).collect()
    null_rows = [r for r in got if r.nk is None]
    assert len(null_rows) == (1 if any(nk is None for _, nk, _ in rows) else 0)
    if null_rows:
        first_null_pos = next(i for i, (_, nk, _) in enumerate(rows) if nk is None)
        assert null_rows[0].pos == first_null_pos


@given(rows=rows_strategy)
@SETTINGS
def test_validate_split_partitions_input(spark, rows):
    df = spark.createDataFrame(
        [(i, k, nk, v) for i, (k, nk, v) in enumerate(rows)],
        "pos long, k long, nk long, v long",
    )
    err = validation_error_column(
        [
            ("v_nonnegative", F.col("v") >= 0),
            ("nk_present", F.col("nk").isNotNull()),
        ]
    )
    flagged = df.withColumn("validation_error", err)
    valid = flagged.filter(F.col("validation_error").isNull())
    invalid = flagged.filter(F.col("validation_error").isNotNull())
    # exact partition: disjoint union back to the input, no row lost
    assert valid.count() + invalid.count() == len(rows)
    got_pos = sorted(r.pos for r in valid.collect()) + sorted(
        r.pos for r in invalid.collect()
    )
    assert sorted(got_pos) == list(range(len(rows)))
    # every invalid row's error names at least one genuinely failed rule
    for r in invalid.collect():
        k, nk, v = rows[r.pos][0], rows[r.pos][1], rows[r.pos][2]
        assert ("v_nonnegative" in r.validation_error) == (v < 0) or (
            "nk_present" in r.validation_error
        ) == (nk is None)


@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=5))
@SETTINGS
def test_topk_is_k_maxima_of_filter(spark, rows, k):
    df = spark.createDataFrame(
        [(i, kk, nk, v) for i, (kk, nk, v) in enumerate(rows)],
        "pos long, k long, nk long, v long",
    )
    filtered = df.filter(F.col("v") >= 0)
    top = filtered.orderBy(F.desc("v"), F.asc("pos")).limit(k).collect()
    pool = sorted(
        ((r.v, -r.pos) for r in filtered.collect()), reverse=True
    )
    expect = [(v, -negpos) for v, negpos in pool[:k]]
    assert [(r.v, r.pos) for r in top] == [(v, p) for v, p in expect]
    # top-k ⊆ filtered set
    filtered_pos = {r.pos for r in filtered.collect()}
    assert all(r.pos in filtered_pos for r in top)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),        # group
            st.integers(min_value=1, max_value=500),      # weight (n_chars)
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_kfold_partitions_any_keyspace(spark, rows):
    """kfold_col is a total function: every key lands in exactly one
    fold in [0, K), whatever the id distribution (including dense,
    sparse, and adversarial Knuth-multiple keys)."""
    from facebook_ad_library_data_pipeline_spark.operators.splits import K_FOLDS, kfold_col

    df = spark.createDataFrame(
        [(i * 104729 + g, g, w) for i, (g, w) in enumerate(rows)],
        "doc_id long, grp long, w long",
    )
    out = df.select("doc_id", kfold_col("doc_id").alias("fold")).collect()
    assert len(out) == len(rows)
    assert all(0 <= r["fold"] < K_FOLDS for r in out)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=6), min_size=2, max_size=12)
)
@SETTINGS
def test_token_entropy_bounds(spark, counts):
    """0 <= H <= ln(n_distinct) for any token multiset, with equality
    at uniform counts — the Shannon bound, checked through the real
    Spark expression chain."""
    import math

    toks = " ".join(f"t{i}" for i, c in enumerate(counts) for _ in range(c))
    df = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    from facebook_ad_library_data_pipeline_spark.functions.text import tokens_col

    cnt = (
        df.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row = (
        cnt.groupBy("doc_id")
        .agg(
            (F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")).alias("h"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .collect()[0]
    )
    assert -1e-9 <= row["h"] <= math.log(row["n_distinct"]) + 1e-9
    if len(set(counts)) == 1:
        assert abs(row["h"] - math.log(len(counts))) < 1e-9


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 200)),  # (start, length)
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_sweepline_matches_bruteforce(spark, intervals):
    """The segmented sweep's max concurrency equals the brute-force
    point-wise maximum over interval endpoints, for arbitrary interval
    sets (the q_peak_concurrency core, minus the session derivation)."""
    from pyspark.sql import Window

    rows = [(s, s + l) for s, l in intervals]
    df = spark.createDataFrame(rows, "s long, e long")
    deltas = df.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        df.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.orderBy(F.asc("t"), F.asc("d")).rowsBetween(Window.unboundedPreceding, 0)
    got = deltas.select(F.sum("d").over(w).alias("c")).agg(F.max("c")).collect()[0][0]
    brute = max(
        sum(1 for (s, e) in rows if s <= t < e) for (s, e) in rows for t in (s,)
    )
    assert got == brute


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    st.integers(min_value=1, max_value=4),
    st.sampled_from([8000, 16000, 44100]),
)
@SETTINGS
def test_wav_roundtrip_any_samples(spark, samples, channels, rate):
    """ANY int16 sample matrix round-trips the PCM16 WAV codec
    bit-exactly at any channel count and rate (the q_audio_pcm_stats
    core, minus the fixture)."""
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.multimodal.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    n = len(samples) - len(samples) % channels
    if n == 0:
        n = channels
        samples = (samples * channels)[:channels]
    arr = np.array(samples[:n], dtype=np.int16).reshape(-1, channels)
    back, got_rate = decode_wav_pcm16(encode_wav_pcm16(arr, rate))
    assert got_rate == rate
    assert np.array_equal(back, arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=8)
        ),
        min_size=1,
        max_size=4,
    )
)
@SETTINGS
def test_video_container_of_bmp_frames_roundtrips(spark, shapes):
    """A container of arbitrary-geometry BMP frames decodes back to
    the exact pixel arrays (container framing composes with the image
    codec for ANY frame shapes, including the row-padding geometries)."""
    import numpy as np

    from facebook_ad_library_data_pipeline_spark.multimodal.bmp import (
        decode_bmp24,
        encode_bmp24,
    )
    from facebook_ad_library_data_pipeline_spark.multimodal.media import (
        decode_video_container,
        encode_video_container,
    )

    frames = []
    for i, (h, w) in enumerate(shapes):
        px = ((np.arange(h * w * 3, dtype=np.int64) * 31 + i * 7) % 256).astype(
            "uint8"
        ).reshape(h, w, 3)
        frames.append(px)
    payload = encode_video_container([encode_bmp24(f) for f in frames])
    out = list(decode_video_container(payload))
    assert len(out) == len(frames)
    for (idx, fb), px in zip(out, frames):
        assert np.array_equal(decode_bmp24(fb), px)
