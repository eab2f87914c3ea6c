"""Byte-pair-encoding tokenizer — a REAL subword tokenizer (the
algorithm behind GPT-2/RoBERTa vocabularies, Sennrich et al. 2016),
structured like every trained artifact in this repo (functions/ivf.py):

- TRAIN on a bounded driver-side sample: merge rules come from word
  frequencies, which saturate long before 100 TB — the fit input is
  O(1) in corpus size. Deterministic: ties in pair frequency break
  lexicographically, so the same sample yields the same merge table
  on every run/engine.
- APPLY distributed: the merge ranks broadcast (~KBs) into a
  mapInPandas pass that encodes every document where it sits — no
  shuffle, no driver data path.

The merge table is engine state, so per-doc token COUNTS aren't
SQL-replayable; the registered query emits pinned INVARIANTS instead
(the ann_recall move): BPE never crosses word boundaries, so decoding
is concatenation and `roundtrip_ok` must hold for every doc; each
word encodes to between 1 and len(word) tokens, so the per-doc count
is bounded by [n_words, n_word_chars]. A merge-application bug
(wrong rank order, dropped token, boundary leak) flips a flag and the
driver hash goes red.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..registry import query

N_MERGES = 200
MAX_FIT_DOCS = 2000

# (sf_dir) -> {pair: rank}
_MERGE_CACHE: dict[str, dict[tuple[str, str], int]] = {}


def train_bpe_merges(texts, n_merges: int = N_MERGES) -> dict[tuple[str, str], int]:
    """Classic BPE fit: start from characters, repeatedly merge the
    most frequent adjacent symbol pair (ties broken lexicographically
    for determinism). Word-frequency-weighted, word-boundary-bounded."""
    from collections import Counter

    word_freq: Counter = Counter()
    for t in texts:
        for w in t.split():
            if w:
                word_freq[w] += 1
    # each word as a tuple of symbols (initially characters)
    words: dict[tuple[str, ...], int] = {tuple(w): f for w, f in word_freq.items()}
    merges: dict[tuple[str, str], int] = {}
    for rank in range(n_merges):
        pair_freq: Counter = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))[0]
        # deterministic: max freq, then lexicographically LARGEST pair
        # (any fixed tie-break works; this one needs no extra sort)
        merges[best] = rank
        merged: dict[tuple[str, ...], int] = {}
        ab = best[0] + best[1]
        for sym, f in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        words = merged
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first until none apply — the standard
    BPE inference loop."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def fit_merges(spark: SparkSession, sf_dir: str) -> dict[tuple[str, str], int]:
    cached = _MERGE_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents").select("text")
    n = docs.count()
    sample = docs
    if n > MAX_FIT_DOCS:
        sample = docs.sample(MAX_FIT_DOCS / n, seed=42)
    texts = [r.text for r in sample.collect() if r.text]
    merges = train_bpe_merges(texts)
    _MERGE_CACHE[sf_dir] = merges
    return merges


_BPE_ORACLE = """
SELECT doc_id,
       TRUE AS roundtrip_ok,
       TRUE AS tokens_within_bounds
FROM documents
"""


@query("q_bpe_tokenize", oracle=_BPE_ORACLE, tags=("llm", "text", "ml"))
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-tokenize the corpus with merges trained on a bounded sample
    and verify the tokenizer's algebra per document, hash-checked:
    decoding (word-wise concatenation) must reproduce the exact
    original text, and the token count must lie in
    [n_words, n_word_chars] (1..len(word) tokens per word). Token ids
    themselves are trained-artifact state — same reasoning as IVF
    centroids — so the flags, not the counts, are the driver-checked
    surface; count distributions are asserted at fixture scale in
    tests/test_bpe.py."""
    merges = fit_merges(spark, sf_dir)

    def encode_batch(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split() if w]
                toks = [encode_word(w, merges) for w in words]
                n_tokens = sum(len(t) for t in toks)
                n_word_chars = sum(len(w) for w in words)
                roundtrip = all("".join(t) == w for t, w in zip(toks, words))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "roundtrip_ok": bool(roundtrip),
                        "tokens_within_bounds": bool(
                            len(words) <= n_tokens <= n_word_chars
                        )
                        if words
                        else True,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "roundtrip_ok", "tokens_within_bounds"]
            )

    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.mapInPandas(
        encode_batch, schema="doc_id long, roundtrip_ok boolean, tokens_within_bounds boolean"
    )
