"""Portable Bloom-filter join pruning — the classic 100 TB trick of
shipping a tiny fixed-size bit array instead of a build-side key set,
so the probe side can drop non-matching rows BEFORE the join shuffle.

Spark's engine does this internally (runtime row-level filtering /
``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
makes the mechanism explicit AND oracle-checkable by using a portable
2-universal hash family (same ``((key*a + b) mod P) mod M`` arithmetic
as the portable count-min sketch in operators/sketches.py) so DuckDB
reproduces the exact bit array and the exact candidate set.

Scale shape: the build side collapses to <= M/32 longs in ONE partial
hash aggregate (map-side combined, broadcastable at any corpus size);
the probe is a broadcast join on the word index — no shuffle of the
big side at all. False positives are bounded by (1-e^{-kn/m})^k; the
no-false-negative guarantee (candidates ⊇ exact matches) is asserted
in tests and visible in the output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

BLOOM_P = 2147483647  # 2^31 - 1 (Mersenne prime)
BLOOM_M = 1 << 16  # bits in the filter
BLOOM_PARAMS = [(48271, 11), (16807, 23), (69621, 37), (40692, 53)]  # k = 4

_SEGMENT = "BUILDING"


def _positions(key_col: str) -> F.Column:
    """Array of the k bit positions for a bigint key."""
    return F.array(
        *[
            (((F.col(key_col) * a + b) % BLOOM_P) % BLOOM_M).cast("long")
            for a, b in BLOOM_PARAMS
        ]
    )


def bloom_bits(keys: DataFrame, key_col: str) -> DataFrame:
    """(word, bits): the Bloom bit array packed 32 bits per long (31 is the max
    shift both engines allow on a signed 64-bit left-shift without
    overflow checks firing).
    One partial-agg shuffle bounded at M/32 = 2048 rows regardless of
    key-set size — always broadcastable."""
    return (
        keys.select(F.explode(_positions(key_col)).alias("pos"))
        .select(
            (F.col("pos") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


_PARAMS_SQL = " UNION ALL ".join(
    f"SELECT {a} AS a, {b} AS b" for a, b in BLOOM_PARAMS
)

_BLOOM_ORACLE = f"""
WITH params AS ({_PARAMS_SQL}),
keys AS (
    SELECT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
),
bits AS (
    SELECT pos // 32 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM (SELECT DISTINCT ((c_custkey * a + b) % {BLOOM_P}) % {BLOOM_M} AS pos
          FROM keys CROSS JOIN params)
    GROUP BY 1
),
probe AS (
    SELECT o.o_orderkey, o.o_orderstatus, o.o_custkey,
           ((o.o_custkey * p.a + p.b) % {BLOOM_P}) % {BLOOM_M} AS pos
    FROM orders o CROSS JOIN params p
),
flags AS (
    SELECT pr.o_orderkey,
           any_value(pr.o_orderstatus) AS o_orderstatus,
           any_value(pr.o_custkey) AS o_custkey,
           bool_and(b.bits IS NOT NULL
                    AND (b.bits & (CAST(1 AS BIGINT) << CAST(pr.pos % 32 AS INT))) != 0)
               AS candidate
    FROM probe pr LEFT JOIN bits b ON pr.pos // 32 = b.word
    GROUP BY pr.o_orderkey
),
marked AS (
    SELECT f.o_orderstatus, f.candidate,
           (f.o_custkey IN (SELECT c_custkey FROM keys)) AS hit
    FROM flags f
)
SELECT o_orderstatus,
       count(*) AS n_probe,
       CAST(sum(CASE WHEN candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN candidate AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
FROM marked
GROUP BY o_orderstatus
"""


@query("q_bloom_prefilter", oracle=_BLOOM_ORACLE, tags=("join", "sketch", "prune"))
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prune orders against the BUILDING-segment customer key set
    and reconcile against the exact semi-join: per order status, how
    many probe rows the filter passes vs truly match (false-positive
    accounting makes the bound visible; zero false negatives by
    construction)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = customer.filter(F.col("c_mktsegment") == _SEGMENT).select("c_custkey")
    bits = bloom_bits(keys, "c_custkey")

    probe = orders.select(
        "o_orderkey", "o_orderstatus", "o_custkey", F.explode(_positions("o_custkey")).alias("pos")
    )
    flagged = (
        probe.join(F.broadcast(bits), (F.col("pos") / 32).cast("long") == F.col("word"), "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_custkey",
            (
                F.col("bits").isNotNull()
                & (
                    F.col("bits").bitwiseAND(
                        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
                    )
                    != 0
                )
            ).alias("bit_set"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.first("o_orderstatus").alias("o_orderstatus"),
            F.first("o_custkey").alias("o_custkey"),
            F.bool_and("bit_set").alias("candidate"),
        )
    )
    exact_keys = keys.withColumn("hit", F.lit(True))
    marked = flagged.join(
        F.broadcast(exact_keys), flagged["o_custkey"] == exact_keys["c_custkey"], "left"
    ).select(
        "o_orderstatus", "candidate", F.coalesce("hit", F.lit(False)).alias("hit")
    )
    return marked.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.when(F.col("candidate"), 1).otherwise(0)).alias("n_candidates"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_exact"),
        F.sum(F.when(F.col("candidate") & ~F.col("hit"), 1).otherwise(0)).alias("n_false_pos"),
    )
