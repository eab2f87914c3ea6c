"""Connected components over the near-dup pair graph — the iterative
algorithm that turns PAIRS into transitive DUP CLUSTERS (a ~ b, b ~ c
⇒ {a,b,c} share one representative), fixing the one-hop blind spot of
pair-wise "drop d2" dedup.

Algorithm: iterative min-label propagation — each node repeatedly
adopts the smallest label among itself and its neighbors until a full
pass changes nothing. Per iteration: one join + one aggregation
(shuffles on node id); convergence in O(diameter) passes, and dup
clusters have tiny diameters in practice. Driver only orchestrates the
loop and reads a 1-row convergence count per pass (no data collected);
``localCheckpoint`` truncates the growing lineage each pass.

The oracle states the same fixpoint as a DuckDB recursive CTE (min
reachable node id over the undirected graph) — an independent
formulation of "transitive closure minimum".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup_near import JACCARD_THRESHOLD, jaccard_pairs
from ..registry import query


def connected_components(nodes: DataFrame, edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node) + (src, dst) undirected → (node, component) with
    component = min node id reachable. Label propagation to fixpoint."""
    labels = nodes.select(F.col("node"), F.col("node").alias("component"))
    # materialize the edge list ONCE — without this every iteration
    # re-executes the (possibly expensive) upstream plan that produced
    # the edges (profiled: the Jaccard join re-ran per pass)
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component")) < F.col("component")
                ).alias("__changed"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels


_CC_ORACLE = f"""
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE [] END AS shingles
       FROM toks),
ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
                 any_value(a.n) AS n1, any_value(b.n) AS n2
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
          WHERE inter * 1.0 / (n1 + n2 - inter) >= {JACCARD_THRESHOLD}),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.dst AS node, reach.r
    FROM reach JOIN sym s ON reach.node = s.src
)
SELECT node AS doc_id, min(r) AS component
FROM reach
GROUP BY node
"""


@query("q_neardup_components", oracle=_CC_ORACLE, tags=("llm", "dedup", "iterative"))
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: component id = min doc_id reachable
    through Jaccard≥0.6 edges. Oracle = recursive CTE (independent
    fixpoint formulation)."""
    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select(F.col("doc_id").alias("node"))
    edges = jaccard_pairs(docs, JACCARD_THRESHOLD).select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    )
    cc = connected_components(nodes, edges)
    return cc.select(F.col("node").alias("doc_id"), "component")


_CLUSTER_DEDUP_ORACLE = f"""
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE [] END AS shingles
       FROM toks),
ex AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter,
                 any_value(a.n) AS n1, any_value(b.n) AS n2
          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
          WHERE inter * 1.0 / (n1 + n2 - inter) >= {JACCARD_THRESHOLD}),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
    SELECT doc_id AS node, doc_id AS r FROM documents
    UNION
    SELECT s.dst AS node, reach.r
    FROM reach JOIN sym s ON reach.node = s.src
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)
SELECT doc_id, source, n_chars
FROM documents JOIN comp USING (doc_id)
WHERE doc_id = component
"""


@query("q_neardup_dedup_transitive", oracle=_CLUSTER_DEDUP_ORACLE, tags=("llm", "dedup", "iterative"))
def q_neardup_dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware dedup: keep exactly ONE doc (the min id) per
    transitive near-dup cluster — strictly stronger than pair-wise
    q_neardup_dedup when chains a~b~c exist."""
    docs = load_table(spark, sf_dir, "documents")
    comp = q_neardup_components(spark, sf_dir)
    return (
        docs.join(comp, "doc_id")
        .filter(F.col("doc_id") == F.col("component"))
        .select("doc_id", "source", "n_chars")
    )
