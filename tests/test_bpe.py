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


def test_inference_equals_training_order_and_flag_is_falsifiable():
    """The greedy-vs-sequential equivalence holds for correctly-ranked
    merges — and the flag is NOT a tautology: inverting the rank order
    (the bug class the flag exists for) makes the two segmentations
    disagree on a word where both merges compete."""
    from facebook_ad_library_data_pipeline_spark.functions.bpe import apply_in_training_order

    texts = ["the cat sat on the mat " * 20, "banana bandana " * 30]
    merges = train_bpe_merges(texts, n_merges=60)
    ordered = [p for p, _ in sorted(merges.items(), key=lambda kv: kv[1])]
    for w in ("the", "banana", "bandana", "zebra", "mat", "catamaran"):
        assert encode_word(w, merges) == apply_in_training_order(w, ordered), w

    # falsifiability: ranks {('a','b'):0, ('b','c'):1} on "abc" —
    # correct inference merges ab first -> ["ab","c"]; an
    # inverted-rank (highest-first) inference merges bc -> ["a","bc"],
    # while the training-order replay still yields ["ab","c"].
    ranks = {("a", "b"): 0, ("b", "c"): 1}
    ordered2 = [("a", "b"), ("b", "c")]
    assert encode_word("abc", ranks) == ["ab", "c"]
    assert apply_in_training_order("abc", ordered2) == ["ab", "c"]

    def inverted_inference(word):
        sym = list(word)
        while len(sym) > 1:
            best = None
            bi = -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r > best):  # inverted
                    best, bi = r, i
            if best is None:
                break
            sym[bi : bi + 2] = [sym[bi] + sym[bi + 1]]
        return sym

    assert inverted_inference("abc") != apply_in_training_order("abc", ordered2)
