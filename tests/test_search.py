"""BM25 scoring (operators/search.py) goldens + ranking sanity."""

from __future__ import annotations

import math

import pytest

from flink_examples_spark.operators.search import bm25_topk


def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(v) / avgdl)
            )
        out[i] = round(s, 6)
    return out


def test_bm25_matches_textbook_reference(spark):
    docs = {
        1: "spark window join window window",
        2: "hash join hash",
        3: "stream stream window hash",
        4: "totally unrelated words only",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r.score for r in
           bm25_topk(df, "doc_id", "text",
                     ["window", "hash", "stream"], topk=4).collect()}
    ref = _bm25_ref(docs, ["window", "hash", "stream"])
    assert got == ref
    # the no-match doc scores exactly 0
    assert got[4] == 0.0


def test_bm25_rank_properties(spark):
    # more occurrences of a rarer term -> strictly higher score at
    # equal length; longer doc with same tf -> lower score
    docs = {
        1: "needle filler filler filler",
        2: "needle needle filler filler",
        3: "needle filler filler filler filler filler filler filler",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {r.doc_id: r.score for r in
           bm25_topk(df, "doc_id", "text", ["needle"], topk=3).collect()}
    assert got[2] > got[1] > got[3]


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [])


def test_bm25_normalizes_case_and_dedupes_terms(spark):
    docs = {1: "window window other", 2: "nothing relevant"}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    base = {r.doc_id: r.score for r in
            bm25_topk(df, "doc_id", "text", ["window"], topk=2).collect()}
    upper = {r.doc_id: r.score for r in
             bm25_topk(df, "doc_id", "text", ["Window"], topk=2).collect()}
    doubled = {r.doc_id: r.score for r in
               bm25_topk(df, "doc_id", "text",
                         ["window", "WINDOW"], topk=2).collect()}
    assert upper == base            # case must not zero the match
    assert doubled == base          # duplicates must not double-count
    assert base[1] > 0.0
