"""BPE trainer/encoder invariants (operators/tokenizer.py)."""

import pytest

from flink_examples_spark.catalog import load_table
from flink_examples_spark.operators.tokenizer import (
    _encode_word,
    bpe_encode_stats,
    train_bpe_merges,
)


def test_hand_example_merge_order_and_counts(spark):
    """'ab ab ab' pretokenizes to ['ab', ' ab', ' ab'] (GPT-2-style
    leading spaces). Pair freqs: (a,b)=3, (' ',a)=2 → merge1=('a','b');
    then (' ','ab')=2 → merge2. Encoded totals follow."""
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges = train_bpe_merges(docs, n_merges=2)
    assert merges == [("a", "b"), (" ", "ab")]

    two = bpe_encode_stats(docs, merges).collect()[0]
    assert two["n_pretokens"] == 3
    assert two["n_bpe_tokens"] == 3  # ['ab'], [' ab'], [' ab']

    one = bpe_encode_stats(docs, merges[:1]).collect()[0]
    assert one["n_bpe_tokens"] == 5  # ['ab'], [' ','ab'] x2


def test_encode_conserves_text_and_is_monotonic(spark, sf_dir):
    """Concatenating a word's BPE tokens reproduces the word exactly
    (no characters created or lost), and more merges never increase
    the token count."""
    docs = load_table(spark, "documents", sf_dir)
    merges = train_bpe_merges(docs, n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}

    from pyspark.sql import functions as F

    from flink_examples_spark.functions.text import bpe_tokens

    words = [
        r["w"]
        for r in docs.select(F.explode(bpe_tokens(F.col("text"))).alias("w"))
        .distinct()
        .collect()
    ]
    assert words
    for w in words:
        assert "".join(_encode_word(w, ranks)) == w

    tot = lambda m: (
        bpe_encode_stats(docs, m)
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .collect()[0]["t"]
    )
    t0, t20, t40 = tot([]), tot(merges[:20]), tot(merges)
    assert t0 >= t20 >= t40
    # zero merges degenerate to characters-of-pretokens
    chars = (
        docs.select(F.explode(bpe_tokens(F.col("text"))).alias("w"))
        .agg(F.sum(F.length("w")).alias("c"))
        .collect()[0]["c"]
    )
    assert t0 == chars


def test_trainer_is_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    assert train_bpe_merges(docs, n_merges=25) == train_bpe_merges(
        docs, n_merges=25
    )


def test_null_and_empty_text_rows_survive(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, None)], "doc_id long, text string"
    )
    merges = train_bpe_merges(docs, n_merges=2)
    out = {r["doc_id"]: r for r in bpe_encode_stats(docs, merges).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_bpe_tokens"] == 0
    assert out[3]["n_bpe_tokens"] == 0


def test_registered_query_totals_match_pretoken_oracle(spark, sf_dir):
    """The rows-only registered query's pretokens column must equal the
    oracle-verified bpe_token_stats pretoken counts — ties the no-oracle
    query back to an oracle-backed one."""
    from flink_examples_spark.queries import registry

    got = {
        r["source"]: r
        for r in registry()["bpe_train_encode_stats"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    ref = {
        r["source"]: r["bpe_tokens"]
        for r in registry()["bpe_token_stats"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for s, row in got.items():
        assert row["pretokens"] == ref[s]
        assert row["bpe_tokens"] <= row["n_chars"]  # merges only shrink


def test_empty_corpus_trains_empty_merges(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    merges = train_bpe_merges(empty)
    assert merges == []
    assert bpe_encode_stats(empty, merges).count() == 0


def test_encode_stats_carries_input_id_and_keep_col_types(spark):
    """Review regression: output schema derives from the input schema —
    string ids and numeric keep_cols must round-trip (they were
    hard-coded as long/string)."""
    docs = spark.createDataFrame(
        [("u-1", "ab ab", 5), ("u-2", "cd", 2)],
        "doc_id string, text string, n_chars long",
    )
    merges = train_bpe_merges(docs, n_merges=1)
    out = bpe_encode_stats(docs, merges, keep_cols=["n_chars"])
    assert dict(out.dtypes)["doc_id"] == "string"
    assert dict(out.dtypes)["n_chars"] == "bigint"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["u-1"]["n_chars"] == 5 and rows["u-1"]["n_pretokens"] == 2


def test_unigram_viterbi_goldens_and_invariants():
    import math
    from flink_examples_spark.operators.tokenizer import _viterbi_segment

    logp = {"ab": math.log(0.4), "a": math.log(0.1), "b": math.log(0.1),
            "abab": math.log(0.05), "c": math.log(0.1)}
    # high-prob 'ab' beats both char-by-char and the rare whole piece:
    # 2*ln(.4) = -1.83 > ln(.05) = -3.0 > 4*ln(.1)
    assert _viterbi_segment("abab", logp, 6) == ["ab", "ab"]
    # concat(pieces) == word always, incl. unknown chars (floor prob)
    for w in ["abc", "zzz", "cab", "x"]:
        assert "".join(_viterbi_segment(w, logp, 6)) == w
    # deterministic tie-break: equal-prob 'a'+'b' vs... fewer pieces win
    logp2 = {"ab": math.log(0.01), "a": math.log(0.1), "b": math.log(0.1)}
    # ln(.01) vs ln(.1)+ln(.1): mathematically equal; float rounding
    # decides, and on exact equality fewer pieces must win -> 'ab'
    s1 = math.log(0.01)
    s2 = math.log(0.1) + math.log(0.1)
    want = ["ab"] if s1 >= s2 else ["a", "b"]
    assert _viterbi_segment("ab", logp2, 6) == want


def test_unigram_trainer_learns_frequent_pieces(spark):
    from flink_examples_spark.operators.tokenizer import (
        train_unigram_vocab,
        unigram_encode_stats,
    )

    rows = [(i, ("hello world " * 5).strip(), "s") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    vocab = train_unigram_vocab(df, vocab_size=40, em_iters=2)
    # frequent whole words (as space-prefixed pretokens) survive pruning
    assert any("hello" in p for p in vocab)
    out = unigram_encode_stats(df, vocab, group_col="source").collect()[0]
    assert out.n_docs == 20
    assert out.n_words == 20 * 10
    # fertility >= 1e6 (>= one piece per word) and exact-integer ppm
    assert out.fertility_ppm >= 1_000_000
    assert out.n_pieces * 1_000_000 // out.n_words == out.fertility_ppm


def test_unigram_stats_partition_invariant(spark, sf_dir):
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.operators.tokenizer import (
        train_unigram_vocab,
        unigram_encode_stats,
    )

    docs = load_table(spark, "documents", sf_dir).limit(200)
    vocab = train_unigram_vocab(docs, vocab_size=100, em_iters=2)
    a = {r.source: (r.n_words, r.n_pieces) for r in
         unigram_encode_stats(docs, vocab).collect()}
    b = {r.source: (r.n_words, r.n_pieces) for r in
         unigram_encode_stats(docs.repartition(7), vocab).collect()}
    assert a == b and len(a) > 0
