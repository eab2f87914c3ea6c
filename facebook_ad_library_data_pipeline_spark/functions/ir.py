"""BM25 document ranking — the classic sparse-retrieval scorer a
training-data pipeline runs for corpus search / eval-set mining.

Beyond-reference surface (the reference has no retrieval at all;
its north-star README asks for "content similarity" — README.md:57):
this is the lexical complement to the dense-embedding family in
functions/similarity.py.

Cross-engine determinism follows the q_top_terms rule (functions/
text.py): NO libm in the scoring path. The standard BM25 idf is
``ln((N-df+0.5)/(df+0.5)+1)`` — two engines' ``ln`` can differ in the
last ulp and flip a rounded hash — so we use the rank-equivalent
RATIONAL idf ``(N-df+0.5)/(df+0.5)`` (monotone transform of the log
form for fixed saturation; at web scale you would use the log form and
give up hash-exactness, not ranking quality). All remaining arithmetic
is IEEE +,*,/ on identically-constructed doubles, which is
correctly-rounded and engine-independent, and the per-term
contributions are summed in FIXED textual order (conditional
aggregates, one per query term) — never a float ``sum()`` whose
accumulation order Spark does not guarantee.

Scale shape: token explode → one partial-agg shuffle for (doc, term)
TF restricted to the |Q|-term query set (the isin filter is pushed
below the aggregation, so the shuffle carries only matching tokens),
one tiny df/avgdl aggregate broadcast to the scorer, and a global
top-K via TakeOrderedAndProject. Nothing is ever joined per-document
against the full vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..registry import query
from .similarity import QUERY_VEC_ID, _emb_double, cosine
from .text import tokens_col

# Fixed query: one rare term ("dup" — df≈2.6% of docs) so the ranking
# is driven by idf, plus two common terms exercising tf saturation.
BM25_QUERY = ("dup", "join", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# Every non-exact constant is CAST AS DOUBLE in the SQL: a bare 2.2 in
# DuckDB is a DECIMAL, and `tf * 2.2` (BIGINT × DECIMAL) computes in
# EXACT decimal arithmetic before any cast — 1 ulp off Spark's double
# multiply (verified: DuckDB 3*2.2/1.0 = 6.6, doubles give
# 6.6000000000000005). The constants are derived from BM25_K1/BM25_B
# in ONE place so the query and oracle cannot desynchronize.
_CONTRIB_SQL = f"""
           ((n.n_docs - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * CAST({BM25_K1 + 1} AS DOUBLE)
              / (tf.tf + CAST({BM25_K1} AS DOUBLE)
                 * ({1.0 - BM25_B} + {BM25_B} * dl.dl / n.avgdl)))
"""

# CTE chain through `scored` (doc_id, score) — shared by the BM25
# top-k oracle and the q_rank_fusion oracle so the lexical scorer can
# never drift between the standalone and fused rankings.
_BM25_CTES = f"""toks AS (
    SELECT doc_id, s.tok AS term
    FROM documents, unnest(string_split(text, ' ')) AS s(tok)
),
dl AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
n AS (
    SELECT count(*) AS n_docs,
           sum(dl) * 1.0 / count(*) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term IN {BM25_QUERY!r}
    GROUP BY doc_id, term
),
df AS (
    SELECT term, count(DISTINCT doc_id) AS df
    FROM toks WHERE term IN {BM25_QUERY!r}
    GROUP BY term
),
contrib AS (
    SELECT tf.doc_id, tf.term,
{_CONTRIB_SQL}
           AS c
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n
),
scored AS (
    SELECT doc_id,
           floor((coalesce(sum(CASE WHEN term = 'dup' THEN c END), 0)
                  + coalesce(sum(CASE WHEN term = 'join' THEN c END), 0)
                  + coalesce(sum(CASE WHEN term = 'stream' THEN c END), 0))
                 * 1000000.0 + 0.5) / 1000000 AS score
    FROM contrib GROUP BY doc_id
)"""

_BM25_ORACLE = f"""
WITH {_BM25_CTES}
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
FROM scored
ORDER BY score DESC, doc_id
LIMIT {BM25_TOPK}
"""


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score): the BM25 scorer shared by q_bm25_topk and
    q_rank_fusion — ONE implementation, like the oracle's shared
    _BM25_CTES, so the two rankings cannot desynchronize."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select("doc_id", F.explode(tokens_col()).alias("term"))
    # Document length is size(split(text)) — a per-row projection, NOT
    # an explode+groupBy (profiled 2.9 s → 1.6 s at sf0.1: the token
    # re-shuffle was half the query).
    dl = fan_out(docs).select("doc_id", F.size(tokens_col()).alias("dl"))
    # n_docs and avgdl fall out of dl's aggregate — no extra corpus scan.
    n = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    q_toks = toks.filter(F.col("term").isin(*BM25_QUERY))
    tf = q_toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = q_toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # df (|Q| rows) and n (1 row) broadcast; dl is CORPUS-sized, so the
    # doc_id join is hinted shuffle_hash — the q_top_terms rule: never
    # let a fixture-scale stat estimate bake an unbounded broadcast
    # into the plan shape (tf is already shuffled by (doc_id, term);
    # the dl side exchanges on doc_id out of its own aggregation).
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (
                    F.col("tf")
                    * (BM25_K1 + 1)
                    / (
                        F.col("tf")
                        + BM25_K1
                        * ((1.0 - BM25_B) + BM25_B * F.col("dl") / F.col("avgdl"))
                    )
                )
            ).alias("c"),
        )
    )
    per_term = [
        F.coalesce(F.sum(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0))
        for t in BM25_QUERY
    ]
    total = per_term[0]
    for p in per_term[1:]:
        total = total + p
    return contrib.groupBy("doc_id").agg(
        (F.floor(total * 1000000.0 + F.lit(0.5)) / 1000000).alias("score")
    )


@query("q_bm25_topk", oracle=_BM25_ORACLE, tags=("llm", "text", "topk", "ir"))
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for a fixed 3-term query under BM25
    (k1=1.2, b=0.75) with the rational idf (see module docstring).
    Each CASE-summed conditional aggregate sees exactly one row per
    (doc, term) — after the TF grouping a term appears at most once per
    doc — so no float accumulation-order is ever exercised; the three
    per-term contributions are then added in fixed textual order,
    matching the oracle character-for-character."""
    scored = bm25_scored(spark, sf_dir)
    return (
        scored.select(
            "doc_id",
            "score",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("rnk"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


# --------------------------------------------- reciprocal-rank fusion

# RRF (Cormack et al., SIGIR'09): fuse a lexical and a dense ranking
# by summing 1/(k + rank) over the lists each document appears in.
# k=60 is the canonical constant. Hash-exactness: each reciprocal is
# ONE IEEE division of pinned integers and the fusion is ONE addition
# in fixed textual order (lexical term first) — correctly rounded and
# engine-independent, the q_top_terms/no-libm rule.
RRF_K = 60
RRF_DEPTH = 20  # fuse the top-20 of each retriever

_RRF_ORACLE = f"""
WITH {_BM25_CTES},
bm AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rank_bm25
    FROM (SELECT doc_id, score FROM scored
          ORDER BY score DESC, doc_id LIMIT {RRF_DEPTH})
),
cs AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank_cos
    FROM (SELECT e.vec_id AS doc_id,
                 round(list_cosine_similarity(e.embedding::DOUBLE[],
                                              q.embedding::DOUBLE[]), 6)
                     AS cos_sim
          FROM embeddings e
          CROSS JOIN (SELECT embedding FROM embeddings
                      WHERE vec_id = {QUERY_VEC_ID}) q
          WHERE e.vec_id <> {QUERY_VEC_ID}
          ORDER BY cos_sim DESC, e.vec_id LIMIT {RRF_DEPTH})
),
fused AS (
    SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id, rank_bm25, rank_cos,
           coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + rank_bm25),
                    CAST(0 AS DOUBLE))
           + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + rank_cos),
                      CAST(0 AS DOUBLE)) AS rrf_score
    FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
)
SELECT doc_id, rank_bm25, rank_cos, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS fused_rank
FROM fused
ORDER BY fused_rank
"""


@query("q_rank_fusion", oracle=_RRF_ORACLE, tags=("llm", "ir", "similarity", "topk", "ranking"))
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of BM25 (the fixed 3-term query, shared
    scorer ``bm25_scored``) and dense cosine retrieval (query vector
    QUERY_VEC_ID, the q_embedding_topk scorer) at depth 20 — the
    hybrid-retrieval step an eval-set/RAG pipeline runs to combine
    lexical and semantic evidence. Emits both source ranks (NULL when
    a doc appears in only one list), the fused score, and the final
    rank with deterministic tie-break.

    Plan shape at scale: each retriever ends in TakeOrderedAndProject
    (top-20, no global sort); the row_number windows and the full
    outer join run over the two 20-row lists — constant-size, so the
    fusion itself is free at any corpus size. The oracle replays both
    rankings (sharing the BM25 CTE chain) and both reciprocals."""
    _QID = QUERY_VEC_ID
    bm_top = (
        bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
    )
    bm = bm_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank_bm25"),
    )
    emb = _emb_double(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") == _QID).select(F.col("emb").alias("q_emb"))
    cos_top = (
        emb.filter(F.col("vec_id") != _QID)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("emb"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
    )
    cs = cos_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .alias("rank_cos"),
    )
    fused = bm.join(cs, "doc_id", "full_outer").select(
        "doc_id",
        "rank_bm25",
        "rank_cos",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_bm25")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_cos")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    # No final orderBy: fused_rank IS the ordering, the compare is
    # order-insensitive, and a sort of the ≤2·DEPTH-row result would
    # add a rangepartitioning exchange for nothing.
    return fused.withColumn(
        "fused_rank",
        F.row_number().over(Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))),
    )


# --------------------------------------------- positional phrase search

# BM25 and the dense retrievers are bag-of-words; exact-phrase /
# proximity matching needs a POSITIONAL inverted index — the other
# half of a production IR stack (and the primitive behind n-gram
# contamination lookups at fixed offsets). Fixed 2-term phrase chosen
# like BM25_QUERY: frequent enough to match at every graded scale.
PHRASE_QUERY = ("table", "hash")

_PHRASE_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (SELECT doc_id, generate_subscripts(t, 1) AS p, unnest(t) AS tok
        FROM toks),
a AS (SELECT doc_id, p FROM pos WHERE tok = '{PHRASE_QUERY[0]}'),
b AS (SELECT doc_id, p - 1 AS p FROM pos WHERE tok = '{PHRASE_QUERY[1]}'),
m AS (SELECT a.doc_id, a.p FROM a JOIN b USING (doc_id, p))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p) AS BIGINT) AS first_pos,
       CAST(max(p) AS BIGINT) AS last_pos
FROM m GROUP BY doc_id
"""


@query("q_phrase_search", oracle=_PHRASE_ORACLE, tags=("llm", "ir", "text"))
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search via positional posting-list intersection:
    each term's (doc_id, position) postings are filtered out of ONE
    posexplode pass, the second list is shifted by the phrase offset,
    and adjacency becomes a plain EQUI-join on (doc_id, position) —
    the classic positional-index plan, no range predicate, no window.
    Emits per-doc match count and 1-based first/last match positions.

    Scale shape: the exploded index never materializes beyond the two
    term-filtered postings (the isin/equality filters sit directly on
    the generator output, so shuffle volume is the MATCHING postings,
    not the corpus token count); one exchange on (doc_id, p) for the
    join, one on doc_id for the rollup. A k-term phrase chains k-1
    shifted equi-joins on the same key — same exchange reused."""
    docs = load_table(spark, sf_dir, "documents")
    pos = fan_out(docs).select(
        "doc_id", F.posexplode(tokens_col()).alias("p0", "term")
    )
    a = pos.filter(F.col("term") == PHRASE_QUERY[0]).select(
        "doc_id", (F.col("p0") + 1).alias("p")
    )
    b = pos.filter(F.col("term") == PHRASE_QUERY[1]).select(
        "doc_id", F.col("p0").alias("p")
    )
    m = a.join(b, ["doc_id", "p"])
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("p").cast("long").alias("first_pos"),
        F.max("p").cast("long").alias("last_pos"),
    )
