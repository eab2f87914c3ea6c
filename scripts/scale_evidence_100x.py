"""100× scale evidence for the blocking/dedup family — the r07-verdict
extrapolation cell (SCALE_EVIDENCE.md §100x generator).

Two 100×-replicated corpora (~500k docs from sf0.1's 5k), because the
two failure modes they probe are different:

* ``exact``  — every doc replicated verbatim (key offset only). This
  makes the TRUE near-dup pair count quadratic BY CONSTRUCTION:
  C(100,2)=4950 intra-group pairs per natural doc ≈ 24.75M output
  rows. No correct algorithm can beat its own output size, so the
  metric here is shuffle records PER TRUE PAIR — flat-or-falling
  per-pair cost means the banded/inverted-index machinery adds no
  super-output overhead even at pathological duplicate density.
* ``shard``  — every replica's vocabulary is disjoint (each token gets
  a per-replica suffix), so natural near-dup pairs survive WITHIN a
  replica shard (same Jaccard: token remap is a bijection on the
  shingle space) and nothing matches across shards. True pairs grow
  exactly 100× — the realistic "corpus grew 100×, density constant"
  case — and total shuffle/wall must grow ~linearly with the corpus.

Both corpora run the REGISTERED queries (q_minhash_lsh_pairs,
q_ngram_jaccard_pairs) end-to-end on real parquet sf-dirs. Shuffle
records come from the UI REST API (measured, not asserted).

Usage: python scripts/scale_evidence_100x.py [sf_dir] [queries...]
Prints the markdown table rows for SCALE_EVIDENCE.md.
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
from scripts.scale_evidence import shuffle_write_records

QUERIES = ("q_minhash_lsh_pairs", "q_ngram_jaccard_pairs")
REP = 100
REP_OFFSET = 10_000_000


def replicate_exact(spark, sf_dir: str) -> str:
    out = tempfile.mkdtemp(prefix="scale100x_exact_")
    df = load_table(spark, sf_dir, "documents")
    cols = [c for c in df.columns if c != "doc_id"]
    (
        df.select("*", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("rep"))
        .select((F.col("doc_id") + F.col("rep") * REP_OFFSET).alias("doc_id"), *cols)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def replicate_shard(spark, sf_dir: str) -> str:
    """Vocabulary-disjoint replication: suffix every token with the
    replica index. A per-replica bijection on tokens is a bijection on
    word-3-grams, so within-shard Jaccard (and minhash collision
    probabilities over the md5 family, which sees different but equally
    uniform inputs) keep the same DISTRIBUTION; across shards nothing
    collides. Near-dup density per shard == the natural corpus's."""
    out = tempfile.mkdtemp(prefix="scale100x_shard_")
    df = load_table(spark, sf_dir, "documents")
    cols = [c for c in df.columns if c not in ("doc_id", "text")]
    (
        df.select("*", F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * REP_OFFSET).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1#"), F.col("rep").cast("string")),
            ).alias("text"),
            *cols,
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def run(spark, registry, name: str, sf_dir: str):
    pre = shuffle_write_records(spark)
    t0 = time.perf_counter()
    n_out = registry[name].fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    return n_out, shuffle_write_records(spark) - pre, dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    queries = tuple(sys.argv[2:]) or QUERIES
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark("scale-evidence-100x")
    registry = load_all()
    n_base = load_table(spark, sf_dir, "documents").count()

    corpora = [(os.path.basename(sf_dir), sf_dir, n_base)]
    print("building shard corpus ...", flush=True)
    corpora.append((f"{REP}x shard", replicate_shard(spark, sf_dir), n_base * REP))
    print("building exact corpus ...", flush=True)
    corpora.append((f"{REP}x exact", replicate_exact(spark, sf_dir), n_base * REP))

    print("| query | corpus | docs | output rows | shuffle-write records | shuffle/output | wall s |")
    print("|---|---|---|---|---|---|---|")
    rows = {}
    for name in queries:
        for label, d, n in corpora:
            n_out, shuf, dt = run(spark, registry, name, d)
            rows[(name, label)] = (n_out, shuf, dt)
            print(
                f"| {name} | {label} | {n} | {n_out} | {shuf} |"
                f" {shuf / max(n_out, 1):.0f} | {dt:.1f} |",
                flush=True,
            )
    print()
    base_label = os.path.basename(sf_dir)
    for name in queries:
        o1, s1, t1 = rows[(name, base_label)]
        for label in (f"{REP}x shard", f"{REP}x exact"):
            o, s, t = rows[(name, label)]
            print(
                f"# {name} {label}: output x{o / max(o1, 1):.0f},"
                f" shuffle x{s / max(s1, 1):.0f}, wall x{t / max(t1, 1e-9):.0f},"
                f" shuffle/output {s / max(o, 1):.0f} vs base {s1 / max(o1, 1):.0f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
