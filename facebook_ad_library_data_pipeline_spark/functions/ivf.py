"""IVF (inverted-file) ANN — the clustered alternative to hyperplane
LSH (functions/similarity.py): partition the corpus with k-means
centroids, search only the query's nearest cells.

Scale story: train k-means on a bounded sample (MLlib, fixed seed),
assign every vector to its nearest centroid (one map pass), build the
"inverted file" = vectors grouped by cell. A query probes its P nearest
cells → touches ~P/K of the corpus. Centroids are model state —
engine-specific floats → rows-only check; recall vs brute force is
asserted in tests/test_ivf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .similarity import QUERY_VEC_ID, cosine

N_CELLS = 16
N_PROBE = 4


def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")


def train_assign_cells(emb: DataFrame, k: int = N_CELLS) -> tuple[DataFrame, "object"]:
    """Fit k-means (seed pinned) and return (assignments, model).
    array<double> → ml VectorUDT via array_to_vector (no Python loop)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featured = emb.withColumn("features", array_to_vector("emb"))
    model = KMeans(k=k, seed=42, featuresCol="features", predictionCol="cell").fit(featured)
    assigned = model.transform(featured).select("vec_id", "emb", "label", "cell")
    return assigned, model


@query("q_ann_ivf_topk", oracle=None, tags=("llm", "similarity", "topk", "ml"))
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 for the query vector: probe the 4 (of 16) cells whose
    centroids are closest to the query, brute-force only inside them.
    Rows-only (k-means floats are engine state); recall asserted in
    tests."""
    from pyspark.ml.functions import vector_to_array

    emb = _emb_double(spark, sf_dir)
    assigned, model = train_assign_cells(emb)

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    q = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("q_emb")
    )
    probe_cells = (
        centers.crossJoin(F.broadcast(q))
        .select("cell", cosine(F.col("center"), F.col("q_emb")).alias("sim"))
        .orderBy(F.desc("sim"))
        .limit(N_PROBE)
        .select("cell")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "cell",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query("q_ivf_cell_stats", oracle=None, tags=("llm", "similarity", "ml"))
def q_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell occupancy — the balance diagnostic (a degenerate cell
    distribution kills the probe-fraction win)."""
    emb = _emb_double(spark, sf_dir)
    assigned, _ = train_assign_cells(emb)
    return assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
