"""Embedding-matrix statistics: the distributed Gram / covariance
building block behind PCA whitening, low-rank projection, and
embedding-drift monitoring over a 100 TB corpus.

The Gram matrix G = Xᵀ·X is the canonical "d² accumulators, N rows"
reduction: each executor folds its row batches into a LOCAL d×d
partial (one numpy matmul per Arrow batch — no per-row Python), and
the partials merge by key in a d²-row shuffle that is INDEPENDENT of
corpus size. PCA then happens driver-side on the d×d result (the
bounded-model discipline of functions/ivf.py's k-means fit).

Exactness: components are quantized ``floor(x · 1e6)`` into int64
BEFORE any arithmetic (float→double is exact, the scaled product is
one correctly-rounded op, floor is deterministic — the integer-cent
discipline), so partial sums are exact integers and the hash is
order-independent. At petabyte row counts the int64 accumulator would
saturate — production promotes to DECIMAL(38) or accepts float
tolerance; the shape is unchanged.

Reference anchor: the reference has no vector analytics; this extends
the mandated embedding family (similarity.py, ivf.py, pq.py) with the
second-moment statistic they all precondition on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..registry import query

EMBED_DIM = 64
QUANT_SCALE = 1_000_000


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, gram) upper-triangle partial-Gram fold: one int64 numpy
    matmul per Arrow batch, d²/2 rows emitted per PARTITION (not per
    row), merged by a d²-key shuffle."""
    import numpy as np
    import pandas as pd

    idx_i, idx_j = np.triu_indices(EMBED_DIM)

    def fold(batches):
        acc = np.zeros((EMBED_DIM, EMBED_DIM), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            q = np.floor(x.astype(np.float64) * QUANT_SCALE).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": idx_i + 1,  # 1-based to match SQL subscripts
                    "j": idx_j + 1,
                    "partial": acc[idx_i, idx_j],
                }
            )

    return df.select(vec_col).mapInPandas(
        fold, schema="i int, j int, partial long"
    )


_GRAM_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT_SCALE})
                AS BIGINT) AS qv
    FROM embeddings
)
SELECT a.i AS i, b.i AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
"""


@query("q_embedding_gram", oracle=_GRAM_ORACLE, tags=("llm", "embedding", "agg"))
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangle Gram matrix of the embedding corpus —
    d·(d+1)/2 = {n} rows whatever the corpus size. The oracle
    recomputes every entry relationally (unnest → self-join → sum of
    quantized products), so a transposed index, a dropped batch, a
    float-summation shortcut, or a partial that failed to merge flips
    the hash. Plan shape: narrow scan → mapInPandas partial fold
    (emits ≤ one triangle per partition) → groupBy(i, j) over d² keys;
    the shuffle volume is partitions × d², independent of N — the
    property that makes this viable at 100 TB where the naive
    unnest-self-join oracle shape (N·d² rows on the shuffle) is
    not.""".format(n=EMBED_DIM * (EMBED_DIM + 1) // 2)
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return (
        gram_partials(emb)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )


# ---------------------------------------------------------------------------
# Scalar (per-dimension) int8 quantization calibration — the OTHER
# standard vector-compression shape next to product quantization
# (functions/pq.py): PQ learns a codebook over subvectors; scalar
# quantization calibrates a per-dimension [min, max] grid and rounds
# each component to one of 256 levels — 4× memory over float32 with a
# dequantization error every serving stack audits before switching the
# ANN index to int8 (FAISS SQ8, ScaNN's scalar path).
# ---------------------------------------------------------------------------

QUANT8_GRID = 1 << 20  # power-of-two pre-grid: float·2^20 is EXACT in double
QUANT8_LEVELS = 255  # codes 0..255

_INT8_ORACLE = f"""
WITH e AS (
    SELECT generate_subscripts(embedding, 1) AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT8_GRID})
                AS BIGINT) AS q
    FROM embeddings
),
z AS (
    SELECT dim, q,
           min(q) OVER (PARTITION BY dim) AS mnq,
           max(q) OVER (PARTITION BY dim) AS mxq
    FROM e
),
c AS (
    SELECT dim, q, mnq, mxq,
           ((q - mnq) * {QUANT8_LEVELS}) // greatest(mxq - mnq, 1) AS code
    FROM z
),
r AS (
    SELECT dim, mnq, mxq, code,
           abs(mnq + (code * greatest(mxq - mnq, 1)) // {QUANT8_LEVELS} - q)
               AS err
    FROM c
)
SELECT CAST(dim AS INT) AS dim, mnq, mxq,
       CAST(count(*) AS BIGINT) AS n_vals,
       CAST(count(DISTINCT code) AS BIGINT) AS codes_used,
       CAST(sum(err) AS BIGINT) AS sum_abs_err,
       CAST(max(err) AS BIGINT) AS max_err,
       CAST(sum(err) AS DOUBLE) / count(*) AS mean_abs_err
FROM r
GROUP BY dim, mnq, mxq
"""


@query("q_embedding_int8_quant", oracle=_INT8_ORACLE, tags=("llm", "embedding", "agg", "ml"))
def q_embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 quantization calibration + reconstruction
    audit, exact end-to-end: components pre-grid to ``floor(x · 2^20)``
    (power of two — float→double·2^20 is exact in IEEE, so the grid can
    never disagree between engines), each dimension calibrates
    [min, max] over the corpus, codes are the pinned integer
    ``((q - mn)·255) div max(range, 1)`` ∈ [0, 255], and the
    dequantization error is audited per dimension (sum/max absolute
    error in grid units, distinct codes used, mean as the single IEEE
    quotient of two pinned ints). A lost row, a wrong calibration
    bound, a biased rounding rule, or a collapsed code range flips the
    hash; the oracle replays every code relationally.

    Plan shape: posexplode to (dim, q) — N·D narrow rows — then ONE
    hash exchange on dim feeds BOTH the min/max calibration window and
    the final per-dim aggregate (same partitioning, no second
    shuffle); output is exactly D rows whatever the corpus size. At
    100 TB, D=64 partitions of the dim exchange are the only wide
    stage, and per-dim state is 2 ints — the degenerate-skew case
    (64 keys) is the documented trade for a one-pass calibrate+audit;
    production at extreme N would replace the window with a D-row
    broadcast of a pre-aggregated min/max (two scans) to avoid the
    64-key shuffle of N·D rows."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "x"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.floor(F.col("x").cast("double") * QUANT8_GRID)
            .cast("long")
            .alias("q"),
        )
    )
    w = Window.partitionBy("dim")
    z = e.select(
        "dim",
        "q",
        F.min("q").over(w).alias("mnq"),
        F.max("q").over(w).alias("mxq"),
    )
    r = z.select(
        "dim",
        "mnq",
        "mxq",
        F.expr(
            f"((q - mnq) * {QUANT8_LEVELS}) div greatest(mxq - mnq, 1)"
        ).alias("code"),
        F.expr(
            f"abs(mnq + (((q - mnq) * {QUANT8_LEVELS})"
            f" div greatest(mxq - mnq, 1)) * greatest(mxq - mnq, 1)"
            f" div {QUANT8_LEVELS} - q)"
        ).alias("err"),
    )
    # group on dim ALONE so the aggregate reuses the window's
    # hashpartitioning(dim) — no second exchange; mnq/mxq are
    # constant within a dim (any_value is exact here)
    return r.groupBy("dim").agg(
        F.any_value("mnq").alias("mnq"),
        F.any_value("mxq").alias("mxq"),
        F.count(F.lit(1)).cast("long").alias("n_vals"),
        F.countDistinct("code").cast("long").alias("codes_used"),
        F.sum("err").cast("long").alias("sum_abs_err"),
        F.max("err").cast("long").alias("max_err"),
        (
            F.sum("err").cast("double") / F.count(F.lit(1))
        ).alias("mean_abs_err"),
    )
