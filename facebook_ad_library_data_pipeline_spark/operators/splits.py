"""Dataset split operators — the train/eval bookkeeping a training
pipeline runs right before materializing shards:

* **q_kfold_assign** — deterministic k-fold assignment by portable
  Knuth multiplicative hash: every doc lands in exactly one of K folds
  as a pure function of its key, so re-running the job (or re-running
  it on 1000 executors instead of 32 threads) reproduces the folds
  bit-for-bit. The reference's pipeline has no splits at all; this is
  part of the beyond-reference training-prep surface (SURVEY.md §2.B).
* **q_group_reservoir** — fixed-size per-group sample ("k docs per
  source") chosen by hash order, not RNG: a window row_number over
  (source, hash(doc_id)) ≤ k. The deterministic stand-in for per-key
  reservoir sampling — same marginal behavior (each key's sample is a
  uniform-looking fixed-size subset), none of the RNG-state
  irreproducibility.

100 TB posture: the fold assignment is a scan-side projection (no
shuffle — the fold column is computed where the row is read, and the
per-fold rollup is a 5×K-group partial aggregation). The reservoir is
one shuffle on `source`; with a bounded group count the window is a
per-partition heap, and a skewed giant group costs k log k per
partition via the rank filter, never a full sort of the group's data
(TakeOrderedAndProject-style pruning inside the window's sort spill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

K_FOLDS = 5
# Knuth multiplicative constant; salt decorrelates from the sampler's
# (7919) and the sharder's streams so fold ≠ f(sample bucket).
_FOLD_KNUTH = 2654435761
_FOLD_MOD32 = 4294967296
# Keys are pre-reduced mod 2^31 BEFORE the Knuth multiply: (2^31-1) *
# 2654435761 = 5.7e18 < 2^63-1, so the product can never overflow
# BIGINT — Spark 4 runs ANSI mode (overflow THROWS, not wraps) and
# DuckDB errors too, so an unreduced key beyond ~3.47e9 (well inside a
# 100 TB corpus's id space) would kill the query in both engines. The
# reduction is the identity for keys under 2^31, so small-corpus
# outputs are unchanged.
_MOD31 = 2147483648
_FOLD_SALT = 104729

RESERVOIR_K = 7
_RES_SALT = 15485863


def kfold_col(key, k: int = K_FOLDS, salt: int = _FOLD_SALT):
    """Portable fold id in [0, k):
    (((key + salt) mod 2^31) * knuth) mod 2^32 mod k.

    The mod-2^31 pre-reduction is part of the function (not an
    implementation detail): it bounds the multiplicand so the product
    fits in BIGINT on every engine, and the oracle twins apply the SAME
    reduction so impl and oracle stay one function over the full id
    space. Pure BIGINT arithmetic → identical in Spark, DuckDB, or a
    bash one-liner; adding rows never moves existing rows between
    folds."""
    key = F.col(key) if isinstance(key, str) else key
    red = (key + F.lit(salt)) % F.lit(_MOD31)
    return (red * F.lit(_FOLD_KNUTH)) % F.lit(_FOLD_MOD32) % F.lit(k)


_KFOLD_ORACLE = f"""
SELECT (((((doc_id + {_FOLD_SALT}) % {_MOD31}) * {_FOLD_KNUTH}) % {_FOLD_MOD32})) % {K_FOLDS} AS fold,
       source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1, 2
"""


@query("q_kfold_assign", oracle=_KFOLD_ORACLE, tags=("llm", "sampling", "training"))
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold split census: assign every document a deterministic fold
    and roll up (fold, source) counts + char mass — the sanity report a
    pipeline prints before writing fold shards (folds should be ~equal
    and source-balanced; the hash guarantees it in expectation). The
    fold column never shuffles rows: it's computed in the scan
    projection, and only the tiny rollup aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(kfold_col("doc_id").alias("fold"), "source", "n_chars")
        .groupBy("fold", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


_RESERVOIR_ORACLE = f"""
WITH h AS (
    SELECT doc_id, source, n_chars,
           ((((doc_id + {_RES_SALT}) % {_MOD31}) * {_FOLD_KNUTH}) % {_FOLD_MOD32}) AS hv
    FROM documents
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rnk
    FROM h
)
SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= {RESERVOIR_K}
"""


@query("q_group_reservoir", oracle=_RESERVOIR_ORACLE, tags=("llm", "sampling", "window"))
def q_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group fixed-size sample: the {RESERVOIR_K} docs per source
    whose salted Knuth hash sorts first — a deterministic reservoir
    (each group's winners are a stable pseudo-uniform subset; doc_id
    tiebreak makes the total order unambiguous even under hash
    collisions). One shuffle on source; the window keeps a k-row heap
    per group rather than sorting each group's full data."""
    docs = load_table(spark, sf_dir, "documents")
    hv = (
        ((F.col("doc_id") + F.lit(_RES_SALT)) % F.lit(_MOD31)) * F.lit(_FOLD_KNUTH)
    ) % F.lit(_FOLD_MOD32)
    w = Window.partitionBy("source").orderBy(F.asc("hv"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", hv.alias("hv"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= RESERVOIR_K)
        .select("doc_id", "source", "n_chars", "rnk")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (A-Res with a portable-hash uniform)
# ---------------------------------------------------------------------------

WEIGHTED_K = 10
_WS_SALT = 32452843  # decorrelated from the fold/reservoir streams

# Efraimidis-Spirakis A-Res: draw u ~ U(0,1) per row, order by
# u^(1/w) descending; the top-K per group is a weighted sample without
# replacement (P(first pick = i) = w_i / Σw). Substituting the
# portable Knuth hash for u makes the draw reproducible anywhere;
# ordering by ln(u)/w (monotone in u^(1/w)) keeps every operation a
# correctly-rounded IEEE double — identical in both engines, so even
# the ORDER is hash-checkable. u = (h + 0.5) / 2^32 never hits 0 or 1,
# so ln(u) is always finite and negative.
_WEIGHTED_ORACLE = f"""
WITH h AS (
    SELECT doc_id, source, n_chars,
           (((((doc_id + {_WS_SALT}) % {_MOD31}) * {_FOLD_KNUTH}) % {_FOLD_MOD32}) + CAST(0.5 AS DOUBLE))
               / {_FOLD_MOD32} AS u
    FROM documents
),
k AS (SELECT doc_id, source, n_chars, ln(u) / n_chars AS keyv FROM h),
r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY keyv DESC, doc_id) AS rnk
      FROM k)
SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= {WEIGHTED_K}
"""


@query("q_weighted_sample", oracle=_WEIGHTED_ORACLE, tags=("llm", "sampling", "window"))
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement, {WEIGHTED_K} docs per
    source, inclusion probability proportional to n_chars (longer docs
    favored — the char-budget view of a corpus): Efraimidis-Spirakis
    A-Res keyed by a portable hash, so the SAME documents win on every
    engine, run, and cluster size. Same plan shape as
    q_group_reservoir: scan-side key derivation, one shuffle on
    source, per-group k-row heap. The ranking key ln(u)/w only
    affects output through the ORDER, so the determinism bar is low:
    a rank flip needs two keys within ~1 ulp of each other (ln is the
    one op libms may round differently), i.e. a 2^-32 hash collision
    AND near-equal lengths — and doc_id still tiebreaks exact equality.
    Verified hash-identical at sf0.001/0.01/0.1."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (((F.col("doc_id") + F.lit(_WS_SALT)) % F.lit(_MOD31)) * F.lit(_FOLD_KNUTH))
        % F.lit(_FOLD_MOD32)
        + F.lit(0.5)
    ) / F.lit(_FOLD_MOD32)
    keyv = F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.desc("keyv"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", keyv.alias("keyv"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= WEIGHTED_K)
        .select("doc_id", "source", "n_chars", "rnk")
    )
