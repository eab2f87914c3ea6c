"""K-means (Lloyd's algorithm) over quantized embeddings — the THIRD
iterative-algorithm shape in the engine (after connected components'
min-label fixpoint and PageRank's weighted-mass fixpoint): an
alternating assign/update loop with DRIVER-COORDINATED state, which is
how Spark MLlib's own KMeans runs (per-iteration broadcast of K·D
centers, collect of K partial sums — the canonical pattern for
iterative ML on Spark when the model state is tiny and the data is
not).

Determinism contract (what makes a clustering fully oracle-checkable):
* quantization is floor(x · 1024) — 1024 is a POWER OF TWO, so
  float→double·1024 is exact in IEEE and floor is unambiguous in both
  engines (a ×1000 scale would hit round-half ambiguity);
* seeds are the K smallest vec_ids' quantized vectors (no random
  init — both engines pick the same K rows);
* fixed KM_ITERS iterations, no convergence test;
* assignment tie-break: (distance, centroid_id) lexicographic min —
  Spark's least() over structs ≡ SQL row_number ORDER BY dist, cid;
* centroid update is integer division sum div count, truncation
  toward zero in all three places it happens: Spark SQL `div`,
  DuckDB `//`, and the driver-side Python mirror (_tdiv) — verified
  identical on negatives (q values are signed).

The oracle UNROLLS the KM_ITERS assign/update rounds as chained CTEs
over the (vec_id, dim, q) exploded view (the q_pagerank_neardup
discipline), with the same add/compare/divide shapes.

100 TB posture: per iteration the centroids are PYTHON LITERALS baked
into the plan (K·D ints ≈ 2 KB — the broadcast-table degenerate case),
so ASSIGNMENT is a zero-shuffle map: zip_with/aggregate distance per
center, least() argmin, all whole-stage-codegen JVM. The UPDATE is one
groupBy(cid) with 64 per-dim sum columns — map-side combine reduces the
shuffle to K rows × D columns per partition, NOT N·D exploded rows
(a posexplode-then-groupBy would shuffle the whole corpus every round).
The driver collects K rows per iteration; lineage is cut naturally
because each iteration's plan starts fresh from the table scan plus new
literals — no O(iters²) re-execution, no checkpoint needed. Distances
stay < 2^31 (|q| ≤ 2^10+ε, D = 64), sums < 2^63 until ~1.8e15 members
per cluster.

Reference anchor: the reference has no clustering at all; its nearest
analogue is the keyword media-mix classifier (transform_raw_data.py).
This is the beyond-reference curation layer (corpus bucketing for
mixture balancing, the standard companion to the IVF index in
functions/ivf.py — which trains centroids driver-side on a SAMPLE and
is rows-only checkable; this one is the fully-distributed, fully
oracle-checkable Lloyd loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

KM_K = 4  # clusters
KM_ITERS = 3  # fixed Lloyd rounds (assign + update)
KM_DIM = 64  # embedding dimensionality (pinned; runtime-guarded)
KM_QSCALE = 1024  # power-of-two quantization scale (exactness: see above)


def _tdiv(a: int, b: int) -> int:
    """Truncation-toward-zero integer division — the Python mirror of
    Spark SQL `div` and DuckDB `//` (Python's // floors, which differs
    on negative dividends: -7//2 = -4 but -7 div 2 = -3)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q: array<long>) with the dimension guard: a regenerated
    corpus with a different embedding width would otherwise silently
    misalign against the pinned-D oracle (element_at past the end is
    NULL in non-ANSI Spark — a silent wrong answer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * KM_QSCALE).cast("long"),
    )
    return emb.select(
        "vec_id",
        F.when(F.size("embedding") == KM_DIM, qarr)
        .otherwise(
            F.raise_error(
                f"q_kmeans_lloyd: embedding dim != {KM_DIM} — repin KM_DIM"
            )
        )
        .alias("q"),
    )


def _assign(emb: DataFrame, cent: dict[int, list[int]]):
    """Zero-shuffle argmin assignment against literal centroids:
    per-center exact int64 squared-L2 via zip_with/aggregate, then
    least() over (dist, cid) structs — deterministic tie-break.

    The whole expression is built as ONE SQL string handed to a single
    F.expr call (r16 optimization): the previous Column-API form made
    ~900 py4j round-trips per iteration (4×64 lit + zip_with/aggregate
    lambdas + struct/least), measured at 1.4-4.2 s of pure driver-side
    plan construction per round vs 0.5-2.8 s of actual execution —
    guide §4's boundary-crossing cost showing up at PLAN-BUILD time.
    The parsed expression tree (and therefore the result) is identical."""
    structs = []
    for cid in sorted(cent):
        cvec = ", ".join(f"{v}L" for v in cent[cid])
        dist = (
            f"aggregate(zip_with(q, array({cvec}),"
            f" (a, b) -> (a - b) * (a - b)),"
            f" cast(0 as bigint), (acc, x) -> acc + x)"
        )
        structs.append(f"named_struct('d', {dist}, 'cid', {cid})")
    best = structs[0] if len(structs) == 1 else f"least({', '.join(structs)})"
    return emb.withColumn("cid", F.expr(f"({best}).cid"))


def _update(assigned: DataFrame) -> DataFrame:
    """K-row centroid-update aggregate: count + D per-dim sums, all
    map-side combined (shuffle = K rows × D columns). One F.expr per
    aggregate column (65 py4j calls, not ~260)."""
    return assigned.groupBy("cid").agg(
        F.expr("count(1) AS n"),
        *[
            F.expr(f"sum(element_at(q, {i + 1})) AS s{i}")
            for i in range(KM_DIM)
        ],
    )


def _kmeans_oracle() -> str:
    e = f"""
e AS (
    SELECT vec_id, g.dim,
           CAST(floor(CAST(embedding[g.dim] AS DOUBLE) * {KM_QSCALE})
                AS BIGINT) AS q
    FROM embeddings, range(1, {KM_DIM + 1}) g(dim)
),
seeds AS (
    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cid
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KM_K})
),
c0 AS (SELECT s.cid, e.dim, e.q AS c FROM seeds s JOIN e USING (vec_id))"""
    steps = []
    for t in range(1, KM_ITERS + 1):
        steps.append(
            f"""a{t} AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY sum((e.q - c.c) * (e.q - c.c)), c.cid) AS rn
        FROM e JOIN c{t - 1} c USING (dim)
        GROUP BY e.vec_id, c.cid
    ) WHERE rn = 1
)"""
        )
        steps.append(
            f"""c{t} AS (
    SELECT a.cid, e.dim, sum(e.q) // count(*) AS c
    FROM a{t} a JOIN e USING (vec_id)
    GROUP BY a.cid, e.dim
)"""
        )
    return (
        "WITH "
        + e
        + ",\n"
        + ",\n".join(steps)
        + f"""
SELECT c.cid AS cluster_id, CAST(c.dim AS INT) AS dim,
       CAST(c.c AS BIGINT) AS centroid_q,
       s.n_members
FROM c{KM_ITERS} c
JOIN (SELECT cid, CAST(count(*) AS BIGINT) AS n_members
      FROM a{KM_ITERS} GROUP BY cid) s USING (cid)
"""
    )


@query("q_kmeans_lloyd", oracle=_kmeans_oracle(), tags=("llm", "embedding", "iterative", "curation"))
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round Lloyd k-means over the quantized embedding corpus:
    KM_ITERS assign/update rounds from deterministic seeds, returning
    the final centroids EXPLODED to (cluster_id, dim, centroid_q) rows
    with each cluster's membership count — every hashed value an exact
    int64 shared with the unrolled-CTE oracle. See the module docstring
    for the determinism contract and the 100 TB plan argument."""
    emb = _quantized(spark, sf_dir)
    # Deterministic seeds: the K smallest vec_ids (tiny bounded
    # collect — the TakeOrderedAndProject path).
    seed_rows = emb.orderBy("vec_id").limit(KM_K).collect()
    cent = {i: list(r.q) for i, r in enumerate(seed_rows)}
    upd = None
    for t in range(1, KM_ITERS + 1):
        upd = _update(_assign(emb, cent))
        if t < KM_ITERS:
            # Driver-coordinated state handoff: K rows × (1 + D) ints.
            # Empty clusters simply drop out (matching the oracle's
            # inner-join semantics); _tdiv mirrors SQL trunc division.
            cent = {
                r["cid"]: [_tdiv(r[f"s{i}"], r["n"]) for i in range(KM_DIM)]
                for r in upd.collect()
            }
    # Final round stays IN the plan: the output divisions run as SQL
    # `div` on the K-row aggregate, posexploded to (cluster_id, dim).
    return upd.select(
        F.col("cid").alias("cluster_id"),
        F.col("n").alias("n_members"),
        F.posexplode(
            F.array(*[F.expr(f"s{i} div n") for i in range(KM_DIM)])
        ).alias("pos", "centroid_q"),
    ).select(
        "cluster_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("centroid_q").cast("long").alias("centroid_q"),
        "n_members",
    )
