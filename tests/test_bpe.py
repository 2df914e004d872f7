"""BPE tokenizer training — pinned to the classic low/lower/newest/widest
worked example (Sennrich et al. 2016 fixture): merges must come out
es → est → lo → low, with frequency-weighted pair counts."""

from __future__ import annotations

from akka_stream_contrib_spark.functions import bpe_learn_merges, bpe_pair_counts


def _corpus(spark):
    # word frequencies: low×5, lower×2, newest×6, widest×3
    return spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest widest"),
         (2, "widest widest newest newest low low")],
        "doc_id long, text string")


def test_pair_counts_weighted_by_word_freq(spark):
    rows = {(r["a"], r["b"]): r["pair_count"]
            for r in bpe_pair_counts(k=50)(_corpus(spark)).collect()}
    # 'es' appears once in newest(6) + once in widest(3)
    assert rows[("e", "s")] == 9
    assert rows[("s", "t")] == 9
    # 'lo' from low(5) + lower(2)
    assert rows[("l", "o")] == 7
    # 'ne' only from newest
    assert rows[("n", "e")] == 6


def test_learn_merges_classic_sequence(spark):
    out = bpe_learn_merges(_corpus(spark), n_merges=4).collect()
    got = [(r["step"], r["left"], r["right"]) for r in out]
    assert got[0] == (1, "e", "s")
    assert got[1] == (2, "es", "t")
    assert got[2] == (3, "l", "o")
    assert got[3] == (4, "lo", "w")
    # counts are the frequency-weighted pair supports at each step
    assert [r["pair_count"] for r in out] == [9, 9, 7, 7]


def test_overlapping_pairs_merge_left_to_right(spark):
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    out = bpe_learn_merges(docs, n_merges=2).collect()
    # 'aaa' (freq 2) has two (a,a) positions -> support 2*2; the merge
    # applies left-to-right non-overlapping: aaa -> [aa, a], then (aa, a)
    # with one position -> support 2
    assert (out[0]["left"], out[0]["right"]) == ("a", "a")
    assert out[0]["pair_count"] == 4
    assert (out[1]["left"], out[1]["right"]) == ("aa", "a")
    assert out[1]["pair_count"] == 2


def test_empty_corpus_yields_no_merges(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_learn_merges(docs, n_merges=3).count() == 0
    assert bpe_pair_counts()(docs).count() == 0


def test_bpe_encode_left_to_right_greedy(spark):
    from akka_stream_contrib_spark.functions import bpe_encode
    # merge (a,a) over 'aaaa a aaa': left-to-right non-overlapping pass →
    # aaaa→[aa,aa]=2, a→[a]=1, aaa→[aa,a]=2
    docs = spark.createDataFrame([(1, "aaaa a aaa")], "doc_id bigint, text string")
    row = docs.transform(bpe_encode(merges=(("a", "a"),))).head()
    assert (row.n_words, row.bpe_tokens) == (3, 5)


def test_bpe_encode_rank_order_cascade(spark):
    from akka_stream_contrib_spark.functions import bpe_encode
    # 'mer' only forms because rank-1 (e,r) runs before rank-2 (m,er):
    # merge→[m,er]→[mer]=1 token; reversed order leaves [m,e,r]=3
    docs = spark.createDataFrame([(1, "mer")], "doc_id bigint, text string")
    fwd = docs.transform(bpe_encode(merges=(("e", "r"), ("m", "er")))).head()
    rev = docs.transform(bpe_encode(merges=(("m", "er"), ("e", "r")))).head()
    assert fwd.bpe_tokens == 1
    assert rev.bpe_tokens == 2  # (m,er) finds nothing; (e,r) then fires


def test_bpe_encode_tokens_freq_weighted(spark):
    from akka_stream_contrib_spark.functions import bpe_encode_tokens
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab cd")], "doc_id bigint, text string")
    freqs = {r.token: r.freq for r in
             docs.transform(bpe_encode_tokens(merges=(("a", "b"),), k=10)).collect()}
    assert freqs == {"ab": 3, "c": 1, "d": 1}


def test_bpe_encode_no_prefix_symbol_false_positive(spark):
    from akka_stream_contrib_spark.functions import bpe_encode
    # after (b,c) the word 'abc' is [a, bc]; merge (a,b) must NOT fire
    # against the 'bc' symbol that merely STARTS with b (the r6 review bug:
    # left-only separator anchoring merged [a, bc] into one 'abc' token)
    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    row = docs.transform(bpe_encode(merges=(("b", "c"), ("a", "b")))).head()
    assert row.bpe_tokens == 2  # [a, bc]


def test_bpe_learn_oracle_matches_on_adversarial_corpus(spark):
    """The DuckDB learn-oracle must replay _merge_pair exactly on the
    corpus where left-anchored flat replace diverges: after (b,c) and
    (a,b), the word 'abc' is [a, bc] and merge 3 is ('a','bc') — a buggy
    rewrite collapses 'abc' early and loses that merge."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    text = "bc bc bc bc ab ab ab abc abc"
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [tuple(r) for r in
           bpe_learn_merges(docs, n_merges=3).orderBy("step").collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1], "text": [text]}))
    expect = [tuple(r) for r in
              con.execute(entry._bpe_learn_oracle(3)).fetchall()]
    assert got == expect
    assert [(l, r) for _, l, r, _ in got] == [("b", "c"), ("a", "b"),
                                              ("a", "bc")]


def test_bpe_handles_line_terminators_inside_words(spark):
    """Words split on spaces only, so \\n can live inside a word: every
    character (including line terminators) must be wrapped/split — a
    non-DOTALL '(.)' left \\n un-wrapped, breaking the 2n+1 invariant and
    diverging from the oracle's per-character split."""
    from akka_stream_contrib_spark.functions import (bpe_encode,
                                                     bpe_learn_merges)
    docs = spark.createDataFrame([(1, "a\nb a\nb xy")],
                                 "doc_id bigint, text string")
    row = docs.transform(bpe_encode(merges=(("a", "\n"),))).head()
    # 'a\nb' -> [a\n, b] = 2 tokens (x2 words) + 'xy' -> 2
    assert (row.n_words, row.bpe_tokens) == (3, 6)
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=1).collect()]
    # per-char symbols: pairs (a,\n)x2, (\n,b)x2, (x,y)x1 -> lexical tie
    # break picks ('\n','b')
    assert got == [(1, "\n", "b", 2)]
