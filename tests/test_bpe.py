"""BPE tokenizer semantics at fixture scale — the tight assertions the
registered query's pinned flags summarize."""

from __future__ import annotations

from facebook_ad_library_data_pipeline_spark.functions.bpe import encode_word, train_bpe_merges


def test_bpe_learns_frequent_pairs_and_compresses():
    texts = ["the cat sat on the mat " * 20, "the hat and the bat " * 20]
    merges = train_bpe_merges(texts, n_merges=50)
    assert merges, "no merges learned"
    # 'the' appears constantly -> must encode to ONE token
    assert encode_word("the", merges) == ["the"]
    # a frequent word encodes to fewer tokens than characters
    assert len(encode_word("cat", merges)) < 3
    # an unseen word still round-trips (falls back toward characters)
    toks = encode_word("zebra", merges)
    assert "".join(toks) == "zebra"
    assert 1 <= len(toks) <= 5


def test_bpe_training_is_deterministic():
    texts = ["alpha beta gamma " * 10, "beta gamma delta " * 10]
    a = train_bpe_merges(texts, n_merges=30)
    b = train_bpe_merges(list(texts), n_merges=30)
    assert a == b


def test_bpe_encode_applies_lowest_rank_first():
    # ranks force ('a','b') before ('ab','c'): "abc" -> ["abc"]
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_word("abc", ranks) == ["abc"]
    # without the second merge it stops at ["ab", "c"]
    assert encode_word("abc", {("a", "b"): 0}) == ["ab", "c"]


def test_bpe_corpus_flags_hold(spark, sf_dir):
    from facebook_ad_library_data_pipeline_spark.functions.bpe import q_bpe_tokenize

    rows = q_bpe_tokenize(spark, sf_dir).collect()
    assert rows
    assert all(r.roundtrip_ok and r.tokens_within_bounds for r in rows)
