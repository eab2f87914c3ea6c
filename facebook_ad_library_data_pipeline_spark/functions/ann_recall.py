"""ANN quality as a driver-visible metric: recall@10 of each
approximate index (random-hyperplane LSH, IVF, IVF-PQ) against the
exact brute-force top-10 for the same query vector.

The index internals are engine state (trained centroids, codebooks,
hash planes), so the ANN result sets themselves are rows-only — but
the RECALL JOIN is plain relational algebra: overlap of two 10-row id
sets. Emitting it as a query turns ANN quality from a test-only
assertion (tests/test_ivf.py, test_pq.py) into a per-round driver
observable: a regression in any index drops its recall row.

At scale every input here is already bounded (each side is a top-10),
so the whole query is a handful of broadcast joins over ≤10-row
DataFrames after the underlying scans — the underlying index paths
keep their own scale posture (bucket probes, bounded fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .ivf import q_ann_ivf_topk
from .pq import q_ann_ivf_pq_topk
from .similarity import q_ann_lsh_topk, q_embedding_topk

ANN_METHODS = ("lsh", "ivf", "ivf_pq")
RECALL_K = 10


@query("q_ann_recall", oracle=None, tags=("llm", "similarity", "topk", "ml"))
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 per ANN method vs the exact cosine top-10
    (q_embedding_topk). Rows-only by nature — the approximate sides
    depend on engine-trained index state — but the floor is pinned
    locally in tests/test_ann_recall.py."""
    exact = q_embedding_topk(spark, sf_dir).select("vec_id", F.lit(1).alias("hit"))
    approx = {
        "lsh": q_ann_lsh_topk(spark, sf_dir),
        "ivf": q_ann_ivf_topk(spark, sf_dir),
        "ivf_pq": q_ann_ivf_pq_topk(spark, sf_dir),
    }
    unioned = None
    for method in ANN_METHODS:
        part = approx[method].select(F.lit(method).alias("method"), "vec_id")
        unioned = part if unioned is None else unioned.unionByName(part)
    return (
        unioned.join(F.broadcast(exact), "vec_id", "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_overlap"),
        )
        .select(
            "method",
            "n_returned",
            "n_overlap",
            F.round(F.col("n_overlap") / RECALL_K, 6).alias("recall_at_10"),
        )
        .orderBy("method")
    )
