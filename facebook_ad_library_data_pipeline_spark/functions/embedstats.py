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
