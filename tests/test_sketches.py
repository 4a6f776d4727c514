"""Sketch-aggregate accuracy bounds (the approximate scale paths)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_examples_spark.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    import __spark_entry__ as E

    approx = {
        r.day: r.approx_users
        for r in E.queries()["count_distinct_daily_approx"](spark, sf_dir).collect()
    }
    exact = {
        r.day: r.n
        for r in load_table(spark, "events", sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, est in approx.items():
        assert abs(est - exact[day]) / exact[day] < 0.10  # 5x the 2% rsd


def test_percentile_approx_brackets_exact_median(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    est = ev.agg(F.percentile_approx("value", 0.5, 10000).alias("p")).first()["p"]
    lo, hi = (
        ev.agg(
            F.expr("percentile(value, 0.45)").alias("lo"),
            F.expr("percentile(value, 0.55)").alias("hi"),
        ).first()
    )
    assert lo <= est <= hi
