"""Scale evidence for the dedup family (SCALE_EVIDENCE.md generator).

Runs the three REGISTERED near-dup queries — q_ngram_jaccard_pairs,
q_dup_span_docs, q_neardup_components — end-to-end at sf0.1 and on a
10×-replicated corpus (every doc duplicated 10×: the adversarial case
where every shingle's document frequency is 10× hotter and every
replica pair is a true near-dup), recording wall seconds, total
shuffle-write RECORDS (from Spark's AppStatusStore, i.e. measured not
asserted), and output rows.

The 10× corpus is materialized as a real sf-dir (documents.parquet in
a temp dir) so the queries run their actual registered code paths.

Usage: python scripts/scale_evidence.py [sf_dir]
Prints the markdown table for SCALE_EVIDENCE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from facebook_ad_library_data_pipeline_spark.catalog import load_table
from facebook_ad_library_data_pipeline_spark.registry import load_all
from facebook_ad_library_data_pipeline_spark.session import get_spark

QUERIES = (
    "q_ngram_jaccard_pairs",
    "q_dup_span_docs",
    "q_neardup_components",
    "q_fuzzy_join_edit1",
    "q_embedding_neardup_lsh",
)
REP = 10
REP_OFFSET = 10_000_000


from _evidence_lib import shuffle_write_records  # noqa: E402


def replicate_corpus(spark, sf_dir: str) -> str:
    """Write 10×-replicated documents.parquet AND customer.parquet into
    a temp sf-dir. Replicated customers keep their NAME (only the key
    is offset): every deletion-variant bucket in the fuzzy join gets
    10× occupancy and every distance-1 name pair becomes 100 pairs —
    the adversarial case for the FastSS blocking join (the 45
    distance-0 replica pairs per name are candidates the levenshtein
    verify must reject)."""
    out = tempfile.mkdtemp(prefix="scale10x_")
    # Embedding replicas keep their VECTOR (only vec_id is offset):
    # every replica pair is an exact cosine-1 near-dup landing in the
    # same bucket of BOTH bands — the adversarial hot-bucket case for
    # the banded hyperplane join (true pairs grow ~45x rows).
    for table, key in (
        ("documents", "doc_id"),
        ("customer", "c_custkey"),
        ("embeddings", "vec_id"),
    ):
        df = load_table(spark, sf_dir, table)
        cols = [c for c in df.columns if c != key]
        replicated = df.select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("rep")
        ).select((F.col(key) + F.col("rep") * REP_OFFSET).alias(key), *cols)
        replicated.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    return out


def run(spark, registry, name: str, sf_dir: str):
    pre = shuffle_write_records(spark)
    t0 = time.perf_counter()
    n_out = registry[name].fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    return n_out, shuffle_write_records(spark) - pre, dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_UI"] = "true"  # metrics come from the REST API
    spark = get_spark("scale-evidence")
    registry = load_all()
    n_base = load_table(spark, sf_dir, "documents").count()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    rep_dir = replicate_corpus(spark, sf_dir)

    print("| query | corpus | docs | output rows | shuffle-write records | wall s |")
    print("|---|---|---|---|---|---|")
    rows = {}
    for name in QUERIES:
        base_n = n_emb if name == "q_embedding_neardup_lsh" else n_base
        for label, d, n in ((f"{os.path.basename(sf_dir)}", sf_dir, base_n),
                            (f"{REP}x replicated", rep_dir, base_n * REP)):
            n_out, shuf, dt = run(spark, registry, name, d)
            rows[(name, label)] = (n_out, shuf, dt)
            print(f"| {name} | {label} | {n} | {n_out} | {shuf} | {dt:.1f} |")
    print()
    for name in QUERIES:
        (o1, s1, t1) = rows[(name, os.path.basename(sf_dir))]
        (o10, s10, t10) = rows[(name, f"{REP}x replicated")]
        print(f"# {name}: 10x docs -> shuffle x{s10 / max(s1, 1):.1f}, wall x{t10 / max(t1, 1e-9):.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
