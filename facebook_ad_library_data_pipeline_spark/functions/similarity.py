"""Similarity search over embedding columns (north-star surface).

Three tiers, by scale:

* **q_embedding_topk** — query-vs-corpus brute force: O(n), one scan,
  TakeOrderedAndProject top-k. THE baseline; correct at any scale.
* **q_embedding_neardup_sampled** — exact all-pairs cosine on an
  ABSOLUTE-SIZE deterministic sample: the SAMPLE_N vectors with the
  smallest Lehmer-permuted ids (a TakeOrdered top-k, no sort of the
  corpus). Pair count is C(SAMPLE_N, 2) regardless of corpus size —
  the r01/r02 `% 20` rate sample kept the audit quadratic (pairs grew
  (n/20)²).
* **q_ann_lsh_topk** — random-hyperplane LSH: bucket vectors by the
  sign pattern of dot products with 8 deterministic hyperplanes
  (integer LCG — no RNG at runtime), search only the query's bucket.
  The 100 TB path: bucket join instead of cross join.

Dot products run in double precision via ``F.aggregate`` fold (JVM,
sequential) so the DuckDB oracle (``list_cosine_similarity`` on
DOUBLE[]) reproduces values bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

QUERY_VEC_ID = 0
NEARDUP_COS_THRESHOLD = 0.4
# Fixed audit-sample size: C(512,2) ≈ 131k cosine pairs whether the
# corpus is 10⁴ or 10¹² vectors. The sample is the 512 smallest values
# of a Lehmer permutation of vec_id — deterministic, pseudo-random,
# and expressible identically in Spark and DuckDB (multiplier 48271
# cannot overflow a 64-bit long under ANSI mode for any vec_id below
# ~1.9e14).
SAMPLE_N = 512
_LEHMER_A = 48271
_LEHMER_M = 2147483647


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")


_TOPK_ORACLE = f"""
SELECT e.vec_id,
       e.label,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
WHERE e.vec_id <> {QUERY_VEC_ID}
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
"""


@query("q_embedding_topk", oracle=_TOPK_ORACLE, tags=("llm", "similarity", "topk"))
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for one query vector: broadcast the
    single-row query side, scan the corpus once, heap top-k. Never
    collects the corpus."""
    emb = _emb_double(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("q_emb"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


_NEARDUP_ORACLE = f"""
WITH s AS (
    SELECT vec_id, embedding
    FROM embeddings
    ORDER BY (vec_id * {_LEHMER_A}) % {_LEHMER_M}, vec_id
    LIMIT {SAMPLE_N}
)
SELECT a.vec_id AS v1,
       b.vec_id AS v2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM s a
JOIN s b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {NEARDUP_COS_THRESHOLD}
"""


@query("q_embedding_neardup_sampled", oracle=_NEARDUP_ORACLE, tags=("llm", "similarity", "dedup"))
def q_embedding_neardup_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs on a fixed-size deterministic
    sample (SAMPLE_N smallest Lehmer-permuted vec_ids — TakeOrdered,
    never a full sort). The quadratic audit cost is constant in corpus
    size; the full-corpus path is q_ann_lsh_topk's bucketed join."""
    emb = _emb_double(spark, sf_dir)
    # Materialize the TakeOrdered sample ONCE (both join sides read it),
    # and re-spread the left side: after limit() the sample is a single
    # partition, which would evaluate all C(SAMPLE_N,2) cosines on one
    # core.
    sample = (
        emb.withColumn("perm", (F.col("vec_id") * _LEHMER_A) % _LEHMER_M)
        .orderBy("perm", "vec_id")
        .limit(SAMPLE_N)
        .select("vec_id", "emb")
        .localCheckpoint(eager=False)
    )
    a = sample.select(F.col("vec_id").alias("v1"), F.col("emb").alias("e1")).repartition(16)
    # SAMPLE_N rows × 64 doubles ≈ 300 KB — broadcast the right side so
    # the pair join never shuffles the corpus-derived sample twice.
    b = F.broadcast(sample.select(F.col("vec_id").alias("v2"), F.col("emb").alias("e2")))
    cos = cosine(F.col("e1"), F.col("e2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .select("v1", "v2", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= NEARDUP_COS_THRESHOLD)
        .select("v1", "v2", F.round("cos_raw", 6).alias("cos_sim"))
    )


# --------------------------------------------------------------- LSH ANN

N_PLANES = 8
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def _plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5)
    from an integer LCG — reproducible anywhere, incl. plain SQL."""
    return ((_LCG_A * (p * 64 + d) + _LCG_C) % _LCG_M) / _LCG_M - 0.5


def _bucket_sql(emb_expr: str) -> str:
    """The DuckDB twin of bucket_col: same plane constants (repr'd
    doubles round-trip exactly), same left-to-right summation order —
    so the IEEE result, hence the sign bit, is bit-identical. DuckDB
    lists are 1-indexed."""
    dots = []
    for p in range(N_PLANES):
        terms = " + ".join(
            f"{emb_expr}[{d + 1}] * {_plane_component(p, d)!r}" for d in range(64)
        )
        dots.append(f"CASE WHEN ({terms}) >= 0 THEN {2**p} ELSE 0 END")
    return "(" + " + ".join(dots) + ")"


def _plane_dot_spark_sql(emb_expr: str, p: int) -> str:
    """One plane's dot product as Spark SQL text: the same
    zip_with/aggregate fold the Column form built, but parsed from ONE
    string. The Column form issued ~65 py4j round-trips per plane (64
    ``F.lit`` + the array/lambda bridges) of pure client-side plan
    construction — ~0.5 s per bucket_col/band_col call at 8 planes,
    before a single row ran (the q_kmeans_lloyd lesson, guide §4:
    the boundary cost shows up at plan-BUILD time too). ``repr`` of a
    Python float round-trips exactly and Spark's ``D`` suffix parses
    it with Double.parseDouble, so the literal doubles — hence the
    IEEE fold, hence the sign bit — are bit-identical to ``F.lit``'s."""
    arr = ", ".join(f"{_plane_component(p, d)!r}D" for d in range(64))
    return (
        f"aggregate(zip_with({emb_expr}, array({arr}), (x, y) -> x * y), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def bucket_col(emb: str = "emb", n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: sign bits of dot(v, plane_p) packed into an int.
    `emb` is the embedding column's SQL text (an array<double> column
    name or expression) — string, not Column, so the whole bucket
    expression parses from one F.expr (see _plane_dot_spark_sql)."""
    cases = " + ".join(
        f"(CASE WHEN {_plane_dot_spark_sql(emb, p)} >= 0 THEN {2**p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return F.expr(f"({cases})")


def _lsh_topk_oracle() -> str:
    probe_union = " UNION ALL ".join(
        ["SELECT qb AS pb FROM q"]
        + [f"SELECT xor(qb, {2**p}) FROM q" for p in range(N_PLANES)]
    )
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe,
                  {_bucket_sql("(embedding::DOUBLE[])")} AS qb
           FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
probes AS ({probe_union}),
cand AS (SELECT e.vec_id, e.label,
                round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
         FROM embeddings e CROSS JOIN q
         WHERE e.vec_id <> {QUERY_VEC_ID}
           AND {_bucket_sql("(e.embedding::DOUBLE[])")} IN (SELECT pb FROM probes))
SELECT vec_id, label, cos_sim FROM cand ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@query("q_ann_lsh_topk", oracle=_lsh_topk_oracle(), tags=("llm", "similarity", "topk"))
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN top-10: search the query's bucket PLUS every
    bucket at Hamming distance 1 (flip each of the 8 sign bits) — the
    standard multi-probe move, since a near neighbor most likely
    differs in exactly one marginal hyperplane sign. Oracle-backed:
    the deterministic LCG planes make the bucket assignment (and hence
    the probed candidate set) reproducible in SQL. Recall vs brute
    force is driver-visible via q_ann_recall and floor-asserted in
    tests. At 100 TB: 9/256 ≈ 3.5% of the corpus touched per query
    batch, and the probe set is a 9-row broadcast — the corpus side
    never shuffles."""
    emb = _emb_double(spark, sf_dir).withColumn("bucket", bucket_col("emb"))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    probes = q.select(
        "q_emb",
        F.explode(
            F.array(
                F.col("q_bucket"),
                *[
                    F.col("q_bucket").bitwiseXOR(F.lit(2**p))
                    for p in range(N_PLANES)
                ],
            )
        ).alias("probe_bucket"),
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), F.col("bucket") == F.col("probe_bucket"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


_BUCKET_STATS_ORACLE = f"""
SELECT {_bucket_sql("(embedding::DOUBLE[])")} AS bucket,
       count(*) AS n_vectors
FROM embeddings
GROUP BY bucket
"""


@query("q_ann_bucket_stats", oracle=_BUCKET_STATS_ORACLE, tags=("llm", "similarity"))
def q_ann_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket occupancy histogram — the skew diagnostic you run
    before trusting a bucketed ANN at scale. Oracle-backed: the LCG
    plane constants and the fold order are reproduced verbatim in SQL,
    so both engines compute the identical sign bits (the r02
    cross-engine float lesson — parity comes from identical
    float OPERATIONS, not from avoiding floats)."""
    emb = _emb_double(spark, sf_dir).withColumn("bucket", bucket_col("emb"))
    return emb.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vectors"))


# ---------------------------------------------------------------------------
# Full-corpus embedding-cosine near-dup pairs (banded hyperplane LSH)
# ---------------------------------------------------------------------------

NEARDUP_BANDS = 2  # bands of 8 sign-bits each; planes 0..7 and 8..15
NEARDUP_COS = 0.40


def band_col(emb: str, band: int) -> Column:
    """8-bit hyperplane signature for one band: sign bits of planes
    band*8 .. band*8+7 (same LCG plane family as bucket_col, which is
    exactly band 0). `emb` is the embedding column's SQL text (one
    F.expr parse instead of ~520 py4j calls — see
    _plane_dot_spark_sql)."""
    cases = " + ".join(
        f"(CASE WHEN {_plane_dot_spark_sql(emb, band * 8 + p)} >= 0 "
        f"THEN {2**p} ELSE 0 END)"
        for p in range(8)
    )
    return F.expr(f"({cases})")


def _band_sql(emb_expr: str, band: int) -> str:
    """DuckDB twin of band_col — same constants, same summation order."""
    dots = []
    for p in range(8):
        terms = " + ".join(
            f"{emb_expr}[{d + 1}] * {_plane_component(band * 8 + p, d)!r}" for d in range(64)
        )
        dots.append(f"CASE WHEN ({terms}) >= 0 THEN {2**p} ELSE 0 END")
    return "(" + " + ".join(dots) + ")"


def _neardup_lsh_oracle() -> str:
    bands_union = " UNION ALL ".join(
        f"SELECT vec_id, v, {b} AS band_idx, {_band_sql('v', b)} AS band_val FROM e"
        for b in range(NEARDUP_BANDS)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bands AS ({bands_union}),
cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          AND a.vec_id < b.vec_id)
SELECT c.v1, c.v2,
       round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
FROM cand c JOIN e x ON x.vec_id = c.v1 JOIN e y ON y.vec_id = c.v2
WHERE list_cosine_similarity(x.v, y.v) >= {NEARDUP_COS}
"""


@query(
    "q_embedding_neardup_lsh",
    oracle=_neardup_lsh_oracle(),
    tags=("llm", "dedup", "similarity"),
)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over the WHOLE corpus — the
    semantic-dedup counterpart of MinHash (same banded-LSH shape as
    q_minhash_lsh_pairs, but the signature is hyperplane sign bits, so
    bucket collision probability tracks cosine, not Jaccard).
    Candidates = pairs agreeing on ≥1 of {NEARDUP_BANDS} 8-bit bands;
    exact cosine ≥ {NEARDUP_COS} filter on candidates only. Never
    all-pairs: both banded sides shuffle on (band_idx, band_val) and
    only bucket-mates meet. Oracle-backed end-to-end — the LCG planes
    make every bucket, hence the candidate set, SQL-replayable.

    Scale knob: 8 sign bits/band ⇒ 256 buckets/band, right-sized for
    the test corpora (sf0.1 ≈ 2k vectors ⇒ ~8 rows/bucket). At 100 TB
    you widen bands (16-20 planes) so expected occupancy stays O(rows/
    buckets) constant — same move MinHash banding makes — and recall
    for true near-dups (cos ≥ 0.95) stays high because each extra
    plane only flips with probability θ/π ≈ 0.1. Planted-dup recall is
    asserted in tests/test_redact_splits.py."""
    emb = _emb_double(spark, sf_dir)
    banded = emb.select(
        "vec_id",
        "emb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        band_col("emb", b).alias("band_val"),
                    )
                    for b in range(NEARDUP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "emb", "bb.band_idx", "bb.band_val")
    left = banded.select(
        F.col("vec_id").alias("v1"), F.col("emb").alias("e1"), "band_idx", "band_val"
    )
    right = banded.select(
        F.col("vec_id").alias("v2"), F.col("emb").alias("e2"), "band_idx", "band_val"
    )
    cos = cosine(F.col("e1"), F.col("e2"))
    # Cosine BEFORE distinct: a pair colliding in both bands is scored
    # twice (bounded 2x CPU), but the dedup shuffle then carries only
    # the tiny >=threshold survivor set of (v1, v2, cos) triples — not
    # every candidate with two 64-double payloads attached (~1 KB/row,
    # which would make the distinct the dominant exchange at scale).
    return (
        left.join(right.hint("shuffle_hash"), ["band_idx", "band_val"])
        .filter(F.col("v1") < F.col("v2"))
        .filter(cos >= NEARDUP_COS)
        .select("v1", "v2", F.round(cos, 6).alias("cos_sim"))
        .dropDuplicates(["v1", "v2"])
    )
