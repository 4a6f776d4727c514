"""Deterministic sampling / split operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_examples_spark.catalog import load_table
from flink_examples_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def test_hash_split_total_disjoint_and_stable(spark):
    docs = load_table(spark, "documents", SF)
    a = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    assert a == b  # replayable: same assignment every run
    n = len(a)
    assert n == docs.count()  # total: every row assigned exactly once
    from collections import Counter

    frac = {s: c / n for s, c in Counter(a.values()).items()}
    assert set(frac) <= {"train", "val", "test"}
    assert 0.7 < frac["train"] < 0.9  # 80% ±10pp at 500 docs
    assert frac.get("val", 0) < 0.2 and frac.get("test", 0) < 0.2


def test_hash_split_rejects_weights_not_summing_to_one(spark):
    """A short weight sum must error loudly — the otherwise() guard
    exists only to absorb sub-bucket rounding residue, not to silently
    dump 30% of the corpus into the last split."""
    import pytest

    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(docs, "doc_id", weights=(("train", 0.5), ("val", 0.2)))
    # exact-1.0 and rounding-residue sums still accepted
    hash_split(docs, "doc_id", weights=(("a", 0.3), ("b", 0.3), ("c", 0.4)))


def test_deterministic_sample_rate_and_subset_nesting(spark):
    docs = load_table(spark, "documents", SF)
    s20 = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    s50 = {r.doc_id for r in
           deterministic_sample(docs, "doc_id", 0.5).select("doc_id").collect()}
    n = docs.count()
    assert 0.1 < len(s20) / n < 0.3
    assert 0.4 < len(s50) / n < 0.6
    # same salt + larger rate => superset (bucket thresholds nest), the
    # property that makes progressive scale-ups reuse previous samples
    assert s20 <= s50


def test_deterministic_sample_salt_independence(spark):
    docs = load_table(spark, "documents", SF)
    a = {r.doc_id for r in
         deterministic_sample(docs, "doc_id", 0.5, salt="a")
         .select("doc_id").collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs, "doc_id", 0.5, salt="b")
         .select("doc_id").collect()}
    assert a != b  # different salts draw independently
    n = docs.count()
    overlap = len(a & b) / n
    assert 0.1 < overlap < 0.4  # ~25% expected for two 50% draws


def test_stratified_sample_respects_per_stratum_rates(spark):
    docs = load_table(spark, "documents", SF)
    out = stratified_sample(
        docs, "source", {"src0": 1.0, "src1": 0.0}, "doc_id",
        default_rate=0.5,
    )
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("src0") == total["src0"]  # rate 1.0 keeps all
    assert "src1" not in by_src  # rate 0.0 drops all
    others = sum(v for k, v in by_src.items() if k not in ("src0", "src1"))
    others_total = sum(v for k, v in total.items() if k not in ("src0", "src1"))
    assert 0.3 < others / others_total < 0.7  # default 0.5


def test_null_ids_and_strata_are_handled_not_dropped(spark):
    """NULL ids/strata must hash via a sentinel — concat's null
    propagation would otherwise give NULL buckets, silently dropping the
    rows from every sample and funneling them all into the last split."""
    df = spark.createDataFrame(
        [(1, "a"), (None, "a"), (2, None), (None, None)],
        "id long, src string",
    )
    splits = hash_split(df, "id")
    assert splits.count() == 4  # total: nobody dropped
    # rate-1.0 sample keeps everything, including NULL ids
    assert deterministic_sample(df, "id", 1.0).count() == 4
    # rate-1.0 default keeps NULL strata too
    kept = stratified_sample(df, "src", {"zzz": 0.0}, "id", default_rate=1.0)
    assert kept.count() == 4


def test_global_shuffle_rank_is_dense_deterministic_nontrivial(spark):
    from flink_examples_spark.operators.sampling import global_shuffle_rank

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in global_shuffle_rank(df, "doc_id", 16).collect()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in global_shuffle_rank(df, "doc_id", 16).collect()}
    assert a == b                                   # replayable
    assert sorted(a.values()) == list(range(500))   # dense permutation
    assert sum(1 for k, v in a.items() if k == v) < 10  # actually shuffled


def test_global_shuffle_rank_salt_changes_order_and_nulls_rank(spark):
    from flink_examples_spark.operators.sampling import global_shuffle_rank

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "doc_id long"
    )
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in global_shuffle_rank(df, "doc_id", 4, salt="s1").collect()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in global_shuffle_rank(df, "doc_id", 4, salt="s2").collect()}
    assert sorted(a.values()) == [0, 1, 2, 3]  # NULL id still ranked
    assert a != b                              # independent draws per salt


def test_temperature_mixture_flattens_and_keeps_smallest_whole(spark):
    from flink_examples_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.7)
    kept = {r["lang"]: r["count"]
            for r in out.groupBy("lang").count().collect()}
    assert kept["small"] == 50                       # min stratum keeps 100%
    # big keeps ~(400/50)^-0.3 = 0.536 of 400 = ~214
    assert 170 < kept["big"] < 260
    # deterministic across invocations
    kept2 = {r["lang"]: r["count"]
             for r in temperature_mixture_sample(df, "lang", "doc_id", 0.7)
             .groupBy("lang").count().collect()}
    assert kept == kept2


def test_temperature_mixture_null_stratum_not_dropped(spark):
    from flink_examples_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [(i, "en") for i in range(100)] + [(500 + i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture_sample(df, "lang", "doc_id", alpha=0.7)
    kept = {r["lang"]: r["count"]
            for r in out.groupBy("lang").count().collect()}
    # the NULL stratum is a stratum: smallest (20) -> kept whole, and
    # its rows must NOT vanish through the rates join
    assert kept.get(None) == 20
    # en keeps ~(100/20)^-0.3 = 0.617 -> ~62
    assert 40 < kept["en"] < 85


def test_materialize_repeat_plan_copy_semantics(spark):
    """Manifest expansion semantics on a hand plan: r=2.5 gives every
    doc copies {0,1} plus copy 2 for ~half (hash-selected,
    deterministic); r=1.0 exactly one copy, never a fractional; r=0.4
    a pure subsample; unplanned sources drop; re-running yields the
    identical manifest (replayability)."""
    from flink_examples_spark.operators.sampling import (
        materialize_repeat_plan,
    )

    docs = spark.createDataFrame(
        [(i, "a") for i in range(200)]
        + [(1000 + i, "b") for i in range(50)]
        + [(2000 + i, "c") for i in range(50)]
        + [(3000, "unplanned")],
        "doc_id long, source string",
    )
    plan = spark.createDataFrame(
        [("a", 25000), ("b", 10000), ("c", 4000)],
        "source string, repeat_10k long",
    )
    out = materialize_repeat_plan(docs, plan, "doc_id").collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r.source, []).append((r.doc_id, r.copy_idx))
    assert "unplanned" not in by_src

    a_counts = {}
    for did, ci in by_src["a"]:
        a_counts[did] = a_counts.get(did, 0) + 1
    assert all(v in (2, 3) for v in a_counts.values())
    n_three = sum(1 for v in a_counts.values() if v == 3)
    assert 60 <= n_three <= 140          # ~half get the fractional copy
    assert all(ci <= 2 for _, ci in by_src["a"])

    assert sorted(by_src["b"]) == [(1000 + i, 0) for i in range(50)]

    c_ids = [did for did, ci in by_src["c"]]
    assert len(c_ids) == len(set(c_ids))  # at most one copy each
    assert 5 <= len(c_ids) <= 45          # ~40% subsample

    again = materialize_repeat_plan(docs, plan, "doc_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_materialize_repeat_plan_integer_and_zero_factors(spark):
    """r5 review follow-ups: an integer repeat factor must not explode
    a doomed extra candidate (exactly ceil(r) candidates), and a
    0-repeat plan row emits nothing — not phantom negative copies."""
    from flink_examples_spark.operators.sampling import (
        materialize_repeat_plan,
    )

    docs = spark.createDataFrame(
        [(1, "whole"), (2, "none")], "doc_id long, source string"
    )
    plan = spark.createDataFrame(
        [("whole", 40000), ("none", 0)],
        "source string, repeat_10k long",
    )
    out = materialize_repeat_plan(docs, plan, "doc_id")
    rows = sorted((r.doc_id, r.copy_idx) for r in out.collect())
    assert rows == [(1, 0), (1, 1), (1, 2), (1, 3)]
    # candidate volume check: the explode itself must produce exactly
    # ceil(r) rows per doc (no always-filtered slot)
    assert out.count() == 4
