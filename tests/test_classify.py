"""Crafted-fixture tests for operators/classify.py — classification
semantics the synthetic-corpus oracle can't pin down (generalization
beyond the training label, cross-slice phrase borrowing, broadcast
plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_examples_spark.operators.classify import (
    dsir_hashed_importance,
    nb_token_evidence,
)
from flink_examples_spark.plans.inspect import has_broadcast_join


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_nb_labels_and_verdicts_on_clear_extremes(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),   # clean -> good
        (2, "spam spam spam spam spam spam spam"),    # repetitive -> bad
        (3, "one two three four five six seven"),     # clean -> good
    ]
    out = {
        r["doc_id"]: r
        for r in nb_token_evidence(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert out[1]["label"] == "good" and out[1]["verdict"] == "good"
    assert out[2]["label"] == "bad" and out[2]["verdict"] == "bad"
    # evidence sums carry multiplicity: doc 2's 7 'spam' tokens each
    # count the full 7-occurrence bad mass
    assert out[2]["bad_sum"] == 49 and out[2]["good_sum"] == 0


def test_nb_verdict_generalizes_beyond_training_label(spark):
    # doc 3 trips the repetition rule (label 'bad') but is built from
    # tokens that otherwise appear only in good docs — the classifier
    # overrides the heuristic label. This is the point of training a
    # model instead of shipping the rule.
    junk = "junk junk junk junk junk junk junk junk junk junk"
    rows = [
        (1, "alpha beta gamma delta alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "alpha alpha alpha beta beta beta"),      # 100*(6-2) > 55*6
    ] + [(i, junk) for i in range(4, 9)]
    out = {
        r["doc_id"]: r
        for r in nb_token_evidence(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert out[3]["label"] == "bad"
    assert out[3]["verdict"] == "good"
    assert out[4]["verdict"] == "bad"


def test_nb_empty_token_docs_excluded(spark):
    rows = [(1, "alpha beta"), (2, "   "), (3, "")]
    out = nb_token_evidence(_docs(spark, rows), "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {1}


def test_dsir_selects_target_alike_nontarget_doc(spark):
    schema = "doc_id long, text string, lang string"
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox runs through the green field", "en"),
        # non-target doc borrowing target phrasing -> selected
        (3, "the quick brown fox jumps over everything", "xx"),
        # non-target doc with disjoint bigrams -> zero target evidence
        (4, "uno dos tres cuatro cinco seis siete ocho", "xx"),
    ]
    out = {
        r["doc_id"]: r
        for r in dsir_hashed_importance(
            _docs(spark, rows, schema),
            "doc_id",
            "text",
            F.col("lang") == "en",
        ).collect()
    }
    assert out[3]["selected"] == 1
    assert out[4]["selected"] == 0 and out[4]["target_sum"] == 0
    # target docs select themselves
    assert out[1]["selected"] == 1 and out[2]["selected"] == 1


def test_dsir_short_docs_have_no_row(spark):
    schema = "doc_id long, text string, lang string"
    rows = [(1, "solo", "en"), (2, "two words", "en")]
    out = dsir_hashed_importance(
        _docs(spark, rows, schema), "doc_id", "text", F.col("lang") == "en"
    ).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_classifier_weight_tables_broadcast(spark):
    # the scale contract: the model join must be a broadcast, never a
    # corpus-wide shuffle on the token/feature key
    rows = [(1, "a b c d"), (2, "a a a a")]
    assert has_broadcast_join(
        nb_token_evidence(_docs(spark, rows), "doc_id", "text")
    )
    schema = "doc_id long, text string, lang string"
    rows2 = [(1, "a b c d", "en"), (2, "x y z w", "xx")]
    assert has_broadcast_join(
        dsir_hashed_importance(
            _docs(spark, rows2, schema), "doc_id", "text",
            F.col("lang") == "en",
        )
    )
