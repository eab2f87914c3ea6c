"""Model-based document quality: a word-bigram language model trained
ON the corpus, scoring each document by its mean transition
probability — the classic "quality classifier lite" signal
(C4/Gopher-style pipelines train a reference LM and drop documents
whose likelihood under it is poor; repetitive or templated text scores
HIGH, incoherent token soup scores LOW).

Distributed shape, built for 100 TB:

- Bigram extraction is NARROW per-row array work (shifted-slice
  zip_with, the shingles_col trick) — a document's transitions never
  cross rows, so there is no tokenize shuffle at all.
- The MODEL (bigram counts, prefix counts, vocab size) is
  vocabulary-bounded, not corpus-bounded: aggregates partial map-side
  and the result is broadcast back onto the transitions. At web-scale
  vocabularies the bigram table gets pruned to top-K before broadcast
  (the standard trick); the scoring join's shape is unchanged.
- All probabilities are SCALED INTEGERS — ``(1e9 * (c+1)) div (cp+V)``
  in pure int64 arithmetic, exact and engine-independent (the BM25
  rational-idf discipline from functions/ir.py: no libm on the hash
  path). Int64 headroom: the numerator overflows at count > ~9.2e9
  occurrences of ONE bigram — and Spark's non-ANSI ``div`` would wrap
  silently there while DuckDB errors, so that bound is a hard contract,
  not a soft one. Production at real counts would move to log-space
  doubles (which also removes the bound); the semantics under test are
  identical.

Reference anchor: the reference has no model-based quality signal —
its nearest analogue is the keyword classifier at
`/root/reference/transform_raw_data.py:120-141`; this extends the
mandated LLM-data quality family (q_text_quality, q_repetition_quality,
q_token_entropy) with the likelihood-based member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .text import tokens_col

LM_SCALE = 1_000_000_000


def _bigrams(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(doc_id, [extra_cols...,] w1, w2) per transition — narrow,
    shuffle-free; extra columns (e.g. the provenance label) ride the
    explode so no corpus-width join is ever needed to recover them."""
    toks = docs.select("doc_id", *extra_cols, tokens_col().alias("w"))
    n1 = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("w", 1, n1),
        F.slice("w", 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return toks.select("doc_id", *extra_cols, F.explode(pairs).alias("p")).select(
        "doc_id", *extra_cols, "p.w1", "p.w2"
    )


_LM_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bi AS (
    SELECT doc_id, p[1] AS w1, p[2] AS w2
    FROM (SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p
          FROM toks)
),
counts AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
prefix AS (SELECT w1, count(*) AS cp FROM bi GROUP BY 1),
vocab AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
scored AS (
    SELECT bi.doc_id, ({LM_SCALE} * (c + 1)) // (cp + v) AS p_scaled
    FROM bi JOIN counts USING (w1, w2) JOIN prefix USING (w1) CROSS JOIN vocab
)
SELECT doc_id,
       count(*) AS n_transitions,
       CAST(sum(p_scaled) AS BIGINT) AS lm_sum,
       CAST(sum(p_scaled) AS DOUBLE) / count(*) AS lm_mean
FROM scored
GROUP BY 1
"""


@query("q_lm_quality", oracle=_LM_ORACLE, tags=("llm", "text", "quality", "model"))
def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document likelihood under a corpus-trained add-one-smoothed
    word-bigram LM. Every per-transition probability is the scaled
    integer ``(1e9 * (count(w1,w2)+1)) div (count(w1·)+V)`` — exact in
    both engines — so the hash pins the whole model: a miscounted
    bigram, a wrong prefix total, or a drifted vocabulary size flips
    every affected document's lm_sum. The final mean is one division
    of identical int64s (deterministic double). Self-scoring on the
    training corpus keeps every transition in-vocabulary (a held-out
    split would add a backoff branch, not change the shape).

    Plan shape: narrow bigram explode (no shuffle) → two
    vocabulary-bounded aggregates + a 1-row vocab count, each
    BROADCAST back onto the transitions → map-side-combined rollup to
    one row per doc. The only full-width exchange is the final
    groupBy(doc_id), and explode preserves the scan's partitioning so
    its partial aggregation already collapses to ~1 row per doc per
    partition."""
    docs = load_table(spark, sf_dir, "documents")
    bi = _bigrams(docs)
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    prefix = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("cp"))
    vocab = (
        docs.select(F.explode(tokens_col()).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bi.join(F.broadcast(counts), ["w1", "w2"])
        .join(F.broadcast(prefix), ["w1"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "p_scaled", F.expr(f"({LM_SCALE} * (c + 1)) div (cp + v)")
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum("p_scaled").alias("lm_sum"),
        )
        .withColumn(
            "lm_mean", F.col("lm_sum").cast("double") / F.col("n_transitions")
        )
    )


# ------------------------------------------ DSIR-style target affinity

# Data Selection via Importance Resampling (Xie et al., 2023): weight
# each candidate document by how much more likely a TARGET-domain LM
# finds it than the general-corpus LM, then resample by that weight to
# tilt a web-scale corpus toward the target distribution. Production
# DSIR uses hashed-ngram log-likelihood ratios; the hash-exact twin
# here keeps the ratio but replaces each log-probability sum with the
# engine-exact scaled-integer sum the q_lm_quality model already pins
# — same selection ORDERING semantics for fixed-length comparisons,
# zero libm on the hash path. The target domain is the 'src0' slice of
# the corpus (documents.source is the provenance label).
AFFINITY_TARGET_SOURCE = "src0"

_AFFINITY_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
bi AS (
    SELECT doc_id, source, p[1] AS w1, p[2] AS w2
    FROM (SELECT doc_id, source,
                 unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p
          FROM toks)
),
tcounts AS (SELECT w1, w2, count(*) AS ct FROM bi
            WHERE source = '{AFFINITY_TARGET_SOURCE}' GROUP BY 1, 2),
tprefix AS (SELECT w1, count(*) AS cpt FROM bi
            WHERE source = '{AFFINITY_TARGET_SOURCE}' GROUP BY 1),
tvocab AS (SELECT count(DISTINCT tok) AS vt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents WHERE source = '{AFFINITY_TARGET_SOURCE}')),
ccounts AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
cprefix AS (SELECT w1, count(*) AS cp FROM bi GROUP BY 1),
cvocab AS (SELECT count(DISTINCT tok) AS v
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
scored AS (
    SELECT bi.doc_id,
           ({LM_SCALE} * (coalesce(t.ct, 0) + 1))
               // (coalesce(tp.cpt, 0) + tv.vt) AS pt_scaled,
           ({LM_SCALE} * (c.c + 1)) // (cp.cp + cv.v) AS pc_scaled
    FROM bi
    LEFT JOIN tcounts t USING (w1, w2)
    LEFT JOIN tprefix tp USING (w1)
    JOIN ccounts c USING (w1, w2)
    JOIN cprefix cp USING (w1)
    CROSS JOIN tvocab tv CROSS JOIN cvocab cv
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(sum(pt_scaled) AS BIGINT) AS target_sum,
       CAST(sum(pc_scaled) AS BIGINT) AS corpus_sum,
       CAST(sum(pt_scaled) AS DOUBLE) / CAST(sum(pc_scaled) AS DOUBLE)
           AS affinity
FROM scored
GROUP BY doc_id
"""


@query("q_domain_affinity", oracle=_AFFINITY_ORACLE, tags=("llm", "text", "quality", "model", "curation"))
def q_domain_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document target-domain affinity: the DSIR importance weight
    with both likelihood sums in exact scaled-integer arithmetic — a
    target LM (add-one smoothed on the src0 slice; transitions unseen
    by the target back off to its smoothing floor via LEFT join +
    coalesce-0) and the corpus LM score every document, and the
    affinity is ONE IEEE division of the two pinned int64 sums. The
    oracle replays both models end-to-end, so a miscounted target
    bigram, a wrong backoff denominator, or a vocabulary drift in
    either model flips the hash.

    Plan shape: the single narrow bigram explode feeds BOTH models.
    The TARGET aggregates (tcounts/tprefix) are broadcast by hint —
    DSIR's target slice is a curated, bounded corpus by design. The
    CORPUS aggregates (ccounts/cprefix) are deliberately NOT hinted:
    distinct-bigram cardinality grows ~vocab² with the corpus, so a
    forced broadcast risks driver/executor OOM at 100 TB — AQE decides
    at runtime from the observed aggregate size (broadcast at test
    scale, shuffle join past the threshold; production DSIR would
    bound this with fixed hash buckets). The only full-width exchange
    beyond that is the final per-doc rollup — same scaling as
    q_lm_quality."""
    docs = load_table(spark, sf_dir, "documents")
    bi_src = _bigrams(docs, "source")
    tgt = bi_src.filter(F.col("source") == AFFINITY_TARGET_SOURCE)
    tcounts = tgt.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("ct"))
    tprefix = tgt.groupBy("w1").agg(F.count(F.lit(1)).alias("cpt"))
    # Fail LOUDLY if the target slice is missing (a regenerated corpus
    # with different source labels): without this, Spark's div-by-zero
    # yields all-NULL affinities while the oracle errors — a silent
    # wrong answer on one side and an opaque parity failure on the
    # other. raise_error fires on the 1-row aggregate, not per row.
    tvocab = (
        docs.filter(F.col("source") == AFFINITY_TARGET_SOURCE)
        .select(F.explode(tokens_col()).alias("tok"))
        .agg(F.countDistinct("tok").alias("vt_raw"))
        .select(
            F.when(F.col("vt_raw") > 0, F.col("vt_raw"))
            .otherwise(
                F.raise_error(
                    f"q_domain_affinity: target slice "
                    f"{AFFINITY_TARGET_SOURCE!r} missing from documents"
                ).cast("long")
            )
            .alias("vt")
        )
    )
    ccounts = bi_src.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cprefix = bi_src.groupBy("w1").agg(F.count(F.lit(1)).alias("cp"))
    cvocab = (
        docs.select(F.explode(tokens_col()).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bi_src.join(F.broadcast(tcounts), ["w1", "w2"], "left")
        .join(F.broadcast(tprefix), ["w1"], "left")
        .join(ccounts, ["w1", "w2"])
        .join(cprefix, ["w1"])
        .crossJoin(F.broadcast(tvocab))
        .crossJoin(F.broadcast(cvocab))
        .withColumn(
            "pt_scaled",
            F.expr(
                f"({LM_SCALE} * (coalesce(ct, 0) + 1))"
                " div (coalesce(cpt, 0) + vt)"
            ),
        )
        .withColumn(
            "pc_scaled", F.expr(f"({LM_SCALE} * (c + 1)) div (cp + v)")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum("pt_scaled").alias("target_sum"),
        F.sum("pc_scaled").alias("corpus_sum"),
        (
            F.sum("pt_scaled").cast("double")
            / F.sum("pc_scaled").cast("double")
        ).alias("affinity"),
    )
