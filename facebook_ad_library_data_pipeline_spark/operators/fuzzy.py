"""Fuzzy (edit-distance ≤ 1) string join via deletion neighborhoods —
the FastSS blocking scheme (Bocek et al., "Fast Similarity Search in
Large Dictionaries", 2007).

Beyond-reference surface: entity-resolution blocking is the string-key
sibling of the MinHash/SimHash document blocking in dedup_near.py. Two
strings are within Levenshtein distance 1 iff their deletion
neighborhoods N(s) = {s} ∪ {s minus char i} intersect (a substitution
matches on the variant deleting the differing position; an
insertion/deletion matches one side's identity against the other's
deletion). So the candidate join is an EQUI-join on the variant string
— never an all-pairs cross — followed by an exact ``levenshtein``
verify, both of which Spark and DuckDB compute identically.

Scale shape: O(L) variants per row (L = string length) → one shuffle
on the variant hash; bucket occupancy equals true near-duplicate
multiplicity (the same skew class as an LSH band bucket — a hot
variant means a real high-multiplicity cluster, which AQE skew-join
splits); candidate pairs are deduped with a distinct on the bounded
pair key before the verify. At no point does the plan depend on the
number of DISTINCT strings the way a broadcast would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_FUZZY_ORACLE = """
WITH v AS (
    SELECT c_custkey, c_name, c_mktsegment,
           CASE WHEN t.i = 0 THEN c_name
                ELSE substr(c_name, 1, t.i - 1) || substr(c_name, t.i + 1)
           END AS variant
    FROM customer, unnest(range(0, len(c_name) + 1)) AS t(i)
),
cand AS (
    SELECT DISTINCT a.c_custkey AS k1, b.c_custkey AS k2,
           a.c_name AS n1, b.c_name AS n2,
           a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b
    FROM v a JOIN v b ON a.variant = b.variant AND a.c_custkey < b.c_custkey
)
SELECT seg_a, seg_b, count(*) AS n_pairs
FROM cand
WHERE levenshtein(n1, n2) = 1
GROUP BY seg_a, seg_b
ORDER BY seg_a, seg_b
"""


def edit1_pairs(df: DataFrame, key: str, name: str, payload: str) -> DataFrame:
    """All pairs of rows whose ``name`` strings are at Levenshtein
    distance EXACTLY 1, via the deletion-neighborhood equi-join.
    Returns one row per pair, key-ordered (k1 < k2), with each side's
    payload column. Candidate generation is complete for distance ≤ 1
    (module docstring); the exact ``levenshtein`` verify then drops
    the distance-0 (identical-name) and spurious candidates."""
    v = df.select(
        F.col(key).alias("k"),
        F.col(name).alias("nm"),
        F.col(payload).alias("pl"),
        F.explode(F.sequence(F.lit(0), F.length(name))).alias("i"),
    ).select(
        "k",
        "nm",
        "pl",
        F.when(F.col("i") == 0, F.col("nm"))
        .otherwise(
            F.concat(
                F.expr("substring(nm, 1, i - 1)"),
                F.expr("substring(nm, i + 1)"),
            )
        )
        .alias("variant"),
    )
    a = v.select(
        F.col("k").alias("k1"), F.col("nm").alias("n1"), F.col("pl").alias("pl1"), "variant"
    )
    b = v.select(
        F.col("k").alias("k2"), F.col("nm").alias("n2"), F.col("pl").alias("pl2"), "variant"
    )
    cand = (
        a.join(b.hint("shuffle_hash"), "variant")
        .filter(F.col("k1") < F.col("k2"))
        .select("k1", "k2", "n1", "n2", "pl1", "pl2")
        .distinct()
    )
    return cand.filter(F.levenshtein("n1", "n2") == 1)


@query("q_fuzzy_join_edit1", oracle=_FUZZY_ORACLE, tags=("join", "fuzzy", "dedup"))
def q_fuzzy_join_edit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-name pairs within edit distance exactly 1, aggregated
    to pair counts per (segment of the lower key, segment of the higher
    key). Synthetic customer names differ in digit positions, so the
    pair population scales with the table — the operator sees real
    blocking pressure, not a fixture; the insertion/deletion arm of
    the neighborhood (absent from the fixed-length names here) is
    pinned on a constructed fixture in tests/test_fuzzy_ir.py.

    Plan: explode ≤ L+1 deletion variants per name (position 0 = the
    identity), self-equi-join on the variant, distinct the candidate
    pair, verify with the built-in ``levenshtein`` (JVM-side), then a
    partial-aggregated count. The verify runs only on candidates that
    share a variant — per-name candidate count is bounded by true
    distance-1 neighbors, not corpus size."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    pairs = edit1_pairs(c, "c_custkey", "c_name", "c_mktsegment")
    return (
        pairs.select(F.col("pl1").alias("seg_a"), F.col("pl2").alias("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("seg_a", "seg_b")
    )
