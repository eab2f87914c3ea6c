"""Training-data preparation operators — the batch-assembly surface a
pre-training pipeline needs AFTER curation/dedup (SURVEY.md §2.B
mandate "operations a large-scale training-data pipeline would need";
absent from the reference, which stops at a CSV report):

* **q_pack_sequences** — token-budget packing: assign docs to fixed
  token-budget packs (context windows) by running token count. Packing
  is per (source, shard): a single window per source would funnel a
  100 TB source through one task, so sources are deterministically
  sharded first (doc_id % N) and packing runs inside each shard — the
  standard distributed-packing trade (pack boundaries are per-shard,
  utilization is unchanged in aggregate).
* **q_length_buckets** — sequence-length bucketing for batch shaping:
  docs binned to power-of-two token buckets, with the padding waste
  each bucket would cost at batch time. Pure scan + tiny aggregate.
* **q_repetition_quality** — Gopher-style repetition filter feature:
  duplicate word-2-gram fraction per doc, flagged above 0.5. Reuses
  the CSE-safe shingle builder (functions/text.py).
* **q_mix_rebalance** — language-mix rebalancing: per-language sample
  weight that would equalize the corpus mix to a uniform target. The
  aggregate is a 5-row broadcastable dim — at scale the weights join
  back to the corpus as a broadcast map-side multiply.

All four are single-shuffle-or-less, JVM-only expressions (no Python
on the hot path) with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.money import det_round, det_round_sql
from ..functions.text import shingles_col, tokens_col
from ..registry import query

PACK_BUDGET = 512  # tokens per pack (context window)
PACK_SHARDS = 8    # deterministic sub-shards per source (skew guard)

_PACK_ORACLE = f"""
WITH d AS (
    SELECT source,
           doc_id % {PACK_SHARDS} AS shard,
           doc_id,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
),
c AS (
    SELECT source, shard, doc_id, n_tokens,
           COALESCE(sum(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM d
)
SELECT source, shard,
       CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY source, shard, pack_id
ORDER BY source, shard, pack_id
"""


@query("q_pack_sequences", oracle=_PACK_ORACLE, tags=("llm", "training", "window"))
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing via running count: pack_id = floor(tokens
    before this doc / budget) within (source, doc_id%shards). One
    shuffle on the pack key; the window order (source, shard, doc_id)
    is total (doc_id unique), so the ROWS frame is deterministic.
    Docs can overflow a pack boundary (assign-then-overflow packing) —
    the variant that needs no per-row state machine, hence scales."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        c.groupBy(
            "source",
            "shard",
            F.floor(F.col("cum_before") / PACK_BUDGET).alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard", "pack_id")
    )


# Power-of-two CASE ladder (identical text on both engines — no float
# log2 at bucket edges).
_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _BUCKETS
    )
    return f"CASE {cases} ELSE 1024 END"


_LEN_BUCKET_ORACLE = f"""
WITH d AS (
    SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
)
SELECT {_bucket_sql('n_tokens')} AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum({_bucket_sql('n_tokens')} - n_tokens) AS BIGINT) AS padding_waste
FROM d
GROUP BY bucket
ORDER BY bucket
"""


@query("q_length_buckets", oracle=_LEN_BUCKET_ORACLE, tags=("llm", "training", "agg"))
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing: power-of-two token buckets with the
    padding cost of batching each bucket to its ceiling — the batch-
    shape diagnostic run before fixing a packing/bucketing policy.
    Scan + 7-group aggregate; nothing shuffles but the partial aggs."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens_col())
    bucket = F.lit(1024)
    for b in reversed(_BUCKETS):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    return (
        docs.select(bucket.alias("bucket"), n.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("n_tokens")).alias("padding_waste"),
        )
        .orderBy("bucket")
    )


_REPETITION_ORACLE = """
WITH t AS (
    SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
g AS (
    SELECT doc_id, source,
           CASE WHEN len(toks) >= 2
                THEN list_transform(generate_series(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END AS grams
    FROM t
)
SELECT doc_id, source,
       len(grams) AS n_2grams,
       len(list_distinct(grams)) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN floor((1.0 - len(list_distinct(grams)) * 1.0 / len(grams)) * 1000000 + 0.5) / 1000000
            ELSE 0.0 END AS dup_ratio,
       CASE WHEN len(grams) > 0
            AND (1.0 - len(list_distinct(grams)) * 1.0 / len(grams)) > 0.5
            THEN TRUE ELSE FALSE END AS flagged
FROM g
"""


@query("q_repetition_quality", oracle=_REPETITION_ORACLE, tags=("llm", "training", "text"))
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter feature (Gopher/MassiveText rule family):
    fraction of duplicate word-2-grams per doc; docs above 0.5 get the
    drop flag. Per-row array expressions only — no shuffle at all, and
    the shingle builder is the CSE-safe slice/zip_with form."""
    docs = load_table(spark, sf_dir, "documents")
    grams = shingles_col(tokens_col(), 2)
    d = docs.select(
        "doc_id",
        "source",
        F.size(grams).alias("n_2grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    raw_ratio = 1.0 - F.col("n_distinct") / F.col("n_2grams")
    ratio = F.when(F.col("n_2grams") > 0, det_round(raw_ratio, 6)).otherwise(F.lit(0.0))
    flagged = F.when(
        (F.col("n_2grams") > 0) & (raw_ratio > 0.5), F.lit(True)
    ).otherwise(F.lit(False))
    return d.select(
        "doc_id", "source", "n_2grams", "n_distinct",
        ratio.alias("dup_ratio"), flagged.alias("flagged"),
    )


_MIX_REBALANCE_ORACLE = f"""
WITH counts AS (
    SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_docs) AS total, count(*) AS n_langs FROM counts)
SELECT lang,
       n_docs,
       {det_round_sql("n_docs * 1.0 / total", 6)} AS actual_share,
       {det_round_sql("(total * 1.0 / n_langs) / n_docs", 6)} AS sample_weight
FROM counts, tot
ORDER BY lang
"""


@query("q_mix_rebalance", oracle=_MIX_REBALANCE_ORACLE, tags=("llm", "training", "agg"))
def q_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing weights: sample_weight multiplies each
    doc so every language contributes a uniform share. The per-lang
    aggregate is a tiny dim — at 100 TB the weights broadcast back onto
    the corpus; nothing here ever shuffles the fact table twice."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            det_round(F.col("n_docs") / F.col("total"), 6).alias("actual_share"),
            det_round(
                (F.col("total") / F.col("n_langs")) / F.col("n_docs"), 6
            ).alias("sample_weight"),
        )
        .orderBy("lang")
    )


# ----------------------------------------------------------- decontamination

EVAL_MOD = 97          # doc_id % 97 == 0 → held-out "benchmark" set (~1%)
# Shared 3-gram shingles with any one eval doc before a train doc is
# flagged: 3 ≈ a contiguous 5-token overlap — strict enough to skip
# chance collisions, loose enough that contamination actually surfaces
# at every test scale (at 5, sf0.01 has zero flagged docs and the
# check proves nothing).
CONTAM_SHINGLES = 3

_DECONTAM_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(t) >= 3
                   THEN list_distinct(list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                   ELSE [] END AS shingles
       FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
ev AS (SELECT doc_id AS eval_id, s FROM ex WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, s FROM ex WHERE doc_id % {EVAL_MOD} <> 0),
overlap AS (
    SELECT tr.doc_id, ev.eval_id, count(*) AS shared
    FROM tr JOIN ev USING (s)
    GROUP BY tr.doc_id, ev.eval_id
)
SELECT o.doc_id,
       d.source,
       CAST(max(o.shared) AS BIGINT) AS max_overlap,
       count(*) AS n_eval_partners
FROM overlap o
JOIN documents d USING (doc_id)
WHERE o.shared >= {CONTAM_SHINGLES}
GROUP BY o.doc_id, d.source
ORDER BY max_overlap DESC, doc_id
"""


@query("q_decontaminate", oracle=_DECONTAM_ORACLE, tags=("llm", "training", "dedup"))
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥5 word-3-gram
    shingles with any held-out eval doc (deterministic ~1% eval split on
    doc_id). Same inverted-index join shape as the Jaccard dedup — the
    eval side is a tiny fraction of the postings, so the shuffle carries
    the training postings once and the group-by keys are (train, eval)
    pairs that actually overlap, never a cross product. At 100 TB the
    real eval set is an external table; the split here stands in for it
    with the identical plan."""
    from ..operators.dedup_near import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    ex = exploded_shingles(docs).select("doc_id", "s").localCheckpoint(eager=False)
    ev = ex.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), "s"
    )
    tr = ex.filter(F.col("doc_id") % EVAL_MOD != 0)
    overlap = (
        tr.join(ev.hint("shuffle_hash"), "s")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= CONTAM_SHINGLES)
    )
    src = docs.select("doc_id", "source")
    return (
        overlap.groupBy("doc_id")
        .agg(
            F.max("shared").alias("max_overlap"),
            F.count(F.lit(1)).alias("n_eval_partners"),
        )
        .join(src, "doc_id")
        .select("doc_id", "source", "max_overlap", "n_eval_partners")
        .orderBy(F.desc("max_overlap"), "doc_id")
    )


# ------------------------------------------------------- quality gate

MIN_DOC_TOKENS = 30
MAX_DOC_TOKENS = 1000
MIN_MEAN_TOKEN_LEN = 2.0
MAX_MEAN_TOKEN_LEN = 12.0
MIN_STOPWORD_RATIO = 0.01
MAX_DUP_2GRAM = 0.5

_GATE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source,
           length(text) AS n_char,
           string_split(text, ' ') AS toks
    FROM documents
),
f AS (
    SELECT doc_id, source, n_char,
           len(toks) AS n_tokens,
           (n_char - (len(toks) - 1)) * 1.0 / len(toks) AS mean_tok_len,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to', 'is')))
               * 1.0 / len(toks) AS stop_ratio,
           CASE WHEN len(toks) >= 2
                THEN 1.0 - len(list_distinct(list_transform(
                         generate_series(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1]))) * 1.0 / (len(toks) - 1)
                ELSE 0.0 END AS dup2
    FROM t
)
SELECT doc_id, source, n_tokens,
       concat_ws(',',
           CASE WHEN n_tokens < {MIN_DOC_TOKENS} THEN 'too_short' END,
           CASE WHEN n_tokens > {MAX_DOC_TOKENS} THEN 'too_long' END,
           CASE WHEN mean_tok_len < {MIN_MEAN_TOKEN_LEN}
                  OR mean_tok_len > {MAX_MEAN_TOKEN_LEN} THEN 'bad_token_len' END,
           CASE WHEN stop_ratio < {MIN_STOPWORD_RATIO} THEN 'low_stopwords' END,
           CASE WHEN dup2 > {MAX_DUP_2GRAM} THEN 'repetitive' END) AS drop_reasons,
       (n_tokens >= {MIN_DOC_TOKENS} AND n_tokens <= {MAX_DOC_TOKENS}
        AND mean_tok_len >= {MIN_MEAN_TOKEN_LEN} AND mean_tok_len <= {MAX_MEAN_TOKEN_LEN}
        AND stop_ratio >= {MIN_STOPWORD_RATIO}
        AND dup2 <= {MAX_DUP_2GRAM}) AS keep
FROM f
"""


@query("q_quality_filter", oracle=_GATE_ORACLE, tags=("llm", "training", "text"))
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite C4/Gopher-style quality GATE: length bounds, mean token
    length, stopword floor, duplicate-2-gram ceiling folded into one
    keep/drop verdict with machine-readable drop reasons. The earlier
    text queries emit the FEATURES; this is the decision operator a
    curation pipeline actually filters on. One scan, zero shuffles —
    every rule is a per-row native expression."""
    from ..functions.text import STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    grams = shingles_col(toks, 2)
    f = docs.select(
        "doc_id",
        "source",
        F.length("text").alias("n_char"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: F.array_contains(en, x))).alias("n_stop"),
        F.size(grams).alias("n_2grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct_2grams"),
    )
    mean_tok_len = (F.col("n_char") - (F.col("n_tokens") - 1)) / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    dup2 = F.when(
        F.col("n_2grams") >= 1,
        1.0 - F.col("n_distinct_2grams") / F.col("n_2grams"),
    ).otherwise(F.lit(0.0))
    too_short = F.col("n_tokens") < MIN_DOC_TOKENS
    too_long = F.col("n_tokens") > MAX_DOC_TOKENS
    bad_len = (mean_tok_len < MIN_MEAN_TOKEN_LEN) | (mean_tok_len > MAX_MEAN_TOKEN_LEN)
    low_stop = stop_ratio < MIN_STOPWORD_RATIO
    repetitive = dup2 > MAX_DUP_2GRAM
    return f.select(
        "doc_id",
        "source",
        "n_tokens",
        F.concat_ws(
            ",",
            F.when(too_short, F.lit("too_short")),
            F.when(too_long, F.lit("too_long")),
            F.when(bad_len, F.lit("bad_token_len")),
            F.when(low_stop, F.lit("low_stopwords")),
            F.when(repetitive, F.lit("repetitive")),
        ).alias("drop_reasons"),
        (~too_short & ~too_long & ~bad_len & ~low_stop & ~repetitive).alias("keep"),
    )


# ------------------------------------------------- deterministic sharding

N_SHARDS = 16
_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)
_MOD32 = 4294967296
_MOD31 = 2147483648  # pre-reduce the key so the multiply can never overflow BIGINT (ANSI)


_SHARD_ORACLE = f"""
WITH d AS (
    SELECT doc_id,
           (((doc_id % {_MOD31}) * {_KNUTH}) % {_MOD32}) % {N_SHARDS} AS shard,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
),
tot AS (SELECT count(*) AS total FROM d)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       {det_round_sql(f"count(*) * {N_SHARDS} * 1.0 / any_value(total)", 6)} AS load_factor
FROM d, tot
GROUP BY shard
ORDER BY shard
"""


@query("q_shard_assign", oracle=_SHARD_ORACLE, tags=("llm", "training"))
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: a portable Knuth
    multiplicative hash (pure BIGINT arithmetic, so any engine --
    including the DuckDB oracle -- reproduces it bit-for-bit, unlike
    xxhash64) scatters docs into N_SHARDS output shards, with per-shard
    row/token totals and a load factor (1.0 = perfectly balanced).
    This is the global-shuffle step before training-data writes: at
    100 TB it is one hash shuffle wide, and the balance diagnostic is
    the thing you alert on before burning a training run."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (((F.col("doc_id") % _MOD31) * F.lit(_KNUTH)) % _MOD32) % N_SHARDS
    d = docs.select(
        shard.cast("long").alias("shard"),
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
    )
    tot = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .join(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "shard_tokens",
            "min_doc",
            "max_doc",
            det_round(F.col("n_docs") * N_SHARDS / F.col("total"), 6).alias(
                "load_factor"
            ),
        )
        .orderBy("shard")
    )


_CONVO_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       md5(string_agg(event_type || ':' || CAST(event_id AS VARCHAR), '|'
                      ORDER BY ts, event_id)) AS seq_sig,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
"""


@query("q_conversation_assembly", oracle=_CONVO_ORACLE, tags=("llm", "training", "agg"))
def q_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ORDERED event-sequence assembly — the chat/session
    training-data shape (SFT turns, user trajectories, agent traces):
    every user's events gathered into one time-ordered sequence whose
    exact order is pinned by an md5 fingerprint over the ordered
    (event_type:event_id) transcript. collect_list gives no ordering
    guarantee across shuffles, so the sequence is sorted EXPLICITLY —
    array_sort over struct(ts, event_id, event_type), the struct's
    field order being the tie-broken sort key — the one correct way to
    assemble ordered sequences distributively (an orderBy before
    groupBy is not preserved through a hash aggregate). The oracle
    rebuilds the transcript with ORDER BY inside the aggregate, so a
    lost event, a swap of same-timestamp events (tie-break!), or
    partition-order leakage flips the fingerprint. Plan: one shuffle
    on user_id; the sort is per-group post-shuffle, O(k log k) in
    group size, no global sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    seq = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    transcript = F.array_join(
        F.transform(
            seq, lambda x: F.concat_ws(":", x["event_type"], x["event_id"])
        ),
        "|",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.md5(transcript).alias("seq_sig"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


_NEG_K = 4  # probes per anchor
# Systematic probe stride. NOT self-collision-proof for every corpus
# size (j·97 ≡ 0 mod N whenever 97 | N) and id-space probing can MISS
# when vec_ids are sparse — so the aggregate below counts what was
# actually FOUND (left join, self-probes excluded) instead of claiming
# _NEG_K; n_candidates is the honest denominator a loss function needs.
_NEG_STRIDE = 97

_NEG_ORACLE = f"""
WITH n AS (SELECT count(*) AS total FROM embeddings),
cand AS (
    SELECT e.vec_id, e.label AS anchor_label,
           (e.vec_id + j.j * {_NEG_STRIDE}) % n.total AS cand_id
    FROM embeddings e, n, generate_series(1, {_NEG_K}) AS j(j)
)
SELECT c.vec_id,
       CAST(sum(CASE WHEN t.vec_id IS NOT NULL AND c.cand_id <> c.vec_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN c.cand_id <> c.vec_id AND t.label <> c.anchor_label
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_negatives,
       CAST(sum(CASE WHEN c.cand_id <> c.vec_id AND t.label <> c.anchor_label
                     THEN t.vec_id ELSE 0 END) AS BIGINT) AS neg_checksum
FROM cand c LEFT JOIN embeddings t ON t.vec_id = c.cand_id
GROUP BY c.vec_id
"""


@query("q_negative_sampling", oracle=_NEG_ORACLE, tags=("llm", "training", "embedding"))
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor probes 4 systematic candidates (vec_id + j·97 mod N — the
    reproducible stand-in for random draws, same property as the
    portable-hash samplers: any engine, any retry, same negatives) and
    keeps those with a DIFFERENT label; per anchor the count of
    candidates actually FOUND (self-probes and ids absent from the
    corpus excluded — id-space probing over a sparse post-filter
    corpus legitimately misses, and the report must say so, not claim
    K) plus an id checksum pinning exactly which negatives were drawn.
    Plan: the corpus count broadcasts (1 row), candidates explode K=4
    constant rows per anchor, ONE left join back on cand_id to fetch
    candidate labels (the shuffle), one aggregate; K is constant so
    shuffle volume is K×N rows of 3 ints. The oracle replays the
    stride arithmetic, the found/self exclusions, the label test, and
    the checksum."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    total = emb.agg(F.count(F.lit(1)).alias("total"))
    cand = (
        emb.crossJoin(F.broadcast(total))
        .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))))
        .select(
            "vec_id",
            F.col("label").alias("anchor_label"),
            ((F.col("vec_id") + F.col("j") * _NEG_STRIDE) % F.col("total")).alias(
                "cand_id"
            ),
        )
    )
    # found_id is the joined row's own key, NOT its label: label is a
    # nullable column, so a NULL-labeled candidate must still count as
    # FOUND (mirrors the oracle's `t.vec_id IS NOT NULL`; r12 ADVICE).
    tgt = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("vec_id").alias("found_id"),
        F.col("label").alias("cand_label"),
    )
    found = F.col("found_id").isNotNull() & (
        F.col("cand_id") != F.col("vec_id")
    )
    is_neg = (F.col("cand_id") != F.col("vec_id")) & (
        F.col("cand_label") != F.col("anchor_label")
    )
    return (
        cand.join(tgt, "cand_id", "left")
        .groupBy("vec_id")
        .agg(
            F.sum(F.when(found, 1).otherwise(0))
            .cast("long")
            .alias("n_candidates"),
            F.sum(F.when(is_neg, 1).otherwise(0))
            .cast("long")
            .alias("n_negatives"),
            F.sum(F.when(is_neg, F.col("cand_id")).otherwise(0))
            .cast("long")
            .alias("neg_checksum"),
        )
    )


_MASK_PCT = 15  # mask where portable hash of (doc_id, position) % 100 < 15

_MLM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
), marked AS (
    SELECT doc_id, pos, tok,
           (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                            CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 100)
               < {_MASK_PCT} AS masked
    FROM toks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(sum(CASE WHEN masked THEN pos ELSE 0 END) AS BIGINT)
           AS mask_pos_checksum,
       md5(string_agg(CASE WHEN masked THEN '[MASK]' ELSE tok END, ' '
                      ORDER BY pos)) AS masked_fp
FROM marked
GROUP BY doc_id
"""


@query("q_mlm_masking_plan", oracle=_MLM_ORACLE, tags=("llm", "training", "text"))
def q_mlm_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MLM masking plan: every (doc, position) draws its
    mask decision from the portable md5 hash (15% rate) — the
    reproducible twin of random masking, so a preempted-and-retried
    prep job masks the SAME positions (the task-retry-determinism
    property every training-data writer here guarantees). Per doc: the
    masked count, a position checksum, and the md5 fingerprint of the
    actual masked sequence ('[MASK]' substituted in order) — the
    oracle rebuilds the sequence with ORDER BY inside the aggregate,
    so one flipped decision or a position swap changes the
    fingerprint. Plan: posexplode → hash projection (JVM-side md5) →
    one groupBy(doc_id) with an in-group sort — the conversation-
    assembly shape; no joins, no driver state."""
    from ..operators.dedup_near import portable_hash60

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    marked = toks.withColumn(
        "masked",
        (
            portable_hash60(
                F.concat_ws(":", F.col("doc_id"), F.col("pos"))
            )
            % 100
        )
        < _MASK_PCT,
    )
    seq = F.array_sort(
        F.collect_list(
            F.struct(
                "pos",
                F.when(F.col("masked"), F.lit("[MASK]"))
                .otherwise(F.col("tok"))
                .alias("out"),
            )
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("masked"), 1).otherwise(0))
        .cast("long")
        .alias("n_masked"),
        F.sum(F.when(F.col("masked"), F.col("pos")).otherwise(0))
        .cast("long")
        .alias("mask_pos_checksum"),
        F.md5(F.array_join(F.transform(seq, lambda x: x["out"]), " ")).alias(
            "masked_fp"
        ),
    )


# -------------------------------------------- overlapping chunk split

# RAG / long-context prep: split every document into fixed-size token
# windows with overlap (stride < window) so no boundary-spanning
# passage is lost — the chunking step between ingest and embedding
# that q_pack_sequences' whole-doc packing deliberately does not do.
CHUNK_W = 64  # window tokens
CHUNK_S = 48  # stride tokens (overlap = W - S = 16)

_CHUNK_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
starts AS (
    -- chunk start offsets 0, S, 2S, ... ; every doc emits at least
    -- one chunk (an empty/short doc is one short chunk), and the last
    -- k is ceil((n-W)/S) — the SMALLEST k whose window reaches the end
    -- of the doc (no spurious fully-overlapped window is ever emitted
    -- after coverage is complete)
    SELECT doc_id, w, unnest(generate_series(
        0,
        greatest(CAST(ceil((len(w) - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT), 0),
        1)) AS k
    FROM toks
),
chunks AS (
    SELECT doc_id, k AS chunk_idx,
           w[(k * {CHUNK_S} + 1):(k * {CHUNK_S} + {CHUNK_W})] AS c
    FROM starts
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(c) AS BIGINT) AS n_tokens,
       md5(array_to_string(c, ' ')) AS chunk_fp
FROM chunks
"""


@query("q_chunk_overlap", oracle=_CHUNK_ORACLE, tags=("llm", "training", "text", "ingest"))
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking (W=64 tokens, stride 48):
    each document yields ceil((n−W)/S)+1 windows — offsets 0, S, 2S, …
    — the final window short, every document yielding at least one
    chunk, and each chunk's exact content pinned by an md5 fingerprint
    over the space-joined tokens (an off-by-one at either edge, a lost
    overlap token, or a dropped final chunk flips a fingerprint or the
    row count). Plan: the start-offset fan-out is a per-row
    F.sequence → ONE narrow explode, and the slice is per-row array
    work; there is no aggregate and no KEYED exchange anywhere (the
    only exchange fan_out may insert is its round-robin widening of a
    narrow test-scale scan — a no-op on a production-width scan). At
    100 TB this is a pure map stage, exactly how production chunkers
    run."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select("doc_id", tokens_col().alias("w"))
    n = F.size("w")
    last_k = F.greatest(
        F.ceil((n - F.lit(CHUNK_W)) / F.lit(CHUNK_S).cast("double")).cast("long"),
        F.lit(0).cast("long"),
    )
    ks = toks.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(0).cast("long"), last_k)).alias("k")
    )
    chunk = F.slice("w", (F.col("k") * CHUNK_S + 1).cast("int"), CHUNK_W)
    return ks.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )
