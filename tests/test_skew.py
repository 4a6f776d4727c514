"""Salting helpers must be result-identical to their plain formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_examples_spark.catalog import load_table
from flink_examples_spark.operators.skew import (
    salted_replicate_join,
    salted_two_stage_agg,
)


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    plain = {
        (r.event_type): (r.n, round(r.total, 2))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, round(r.total, 2))
        for r in salted_two_stage_agg(
            ev,
            keys=["event_type"],
            partial_aggs={
                "pn": F.count(F.lit(1)),
                "pt": F.sum("value"),
            },
            final_aggs={
                "n": F.sum("pn"),
                "total": F.sum("pt"),
            },
            salt_source=["event_id"],
            n_salts=16,
        ).collect()
    }
    assert salted == plain


def test_salted_collect_list_decomposition(spark):
    """The collect_list case salting exists for: flatten-of-lists equals
    the unsalted list as a multiset."""
    df = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 1)], "k string, v int"
    )
    out = salted_two_stage_agg(
        df,
        keys=["k"],
        partial_aggs={"vs": F.collect_list("v")},
        final_aggs={"vs": F.flatten(F.collect_list("vs"))},
        salt_source=["v"],
        n_salts=8,
    ).collect()
    by_k = {r.k: sorted(r.vs) for r in out}
    assert by_k["hot"] == list(range(100))
    assert by_k["cold"] == [1]


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "o_custkey").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in salted_replicate_join(
            orders, cust, key="o_custkey", n_salts=4,
            probe_salt_source=["o_orderkey"],
        ).collect()
    }
    assert salted == plain


def test_salted_join_refuses_right_and_keyless_probe(spark):
    """Review regressions: right/full joins would emit n_salts
    null-padded duplicates per unmatched build row; a probe with no
    non-key columns would give every hot-key row the same salt —
    both must raise, not silently corrupt/defeat the mitigation."""
    import pytest

    from flink_examples_spark.operators.skew import salted_replicate_join

    probe = spark.createDataFrame([(1, "x")], "k long, v string")
    build = spark.createDataFrame([(1, "b")], "k long, b string")
    with pytest.raises(ValueError, match="duplicate unmatched"):
        salted_replicate_join(probe, build, "k", how="right")
    keyless = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-key columns"):
        salted_replicate_join(keyless, build, "k")
