"""Bucketed co-located join: the persisted-layout answer to repeated
big-big joins (SURVEY.md §4.1 pre-partitioning reuse, at rest).

Both sides bucketed on the join key with equal bucket counts must join
with ZERO shuffle exchanges — each task zips matching bucket files.
"""

from __future__ import annotations

import pytest

from flink_examples_spark.catalog import load_table
from flink_examples_spark.plans import exchange_count
from flink_examples_spark.sources.readers import write_bucketed_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    try:
        write_bucketed_table(
            orders, "b_orders", str(tmp_path / "o"), ["o_custkey"], 8,
            sort_cols=["o_custkey"],
        )
        write_bucketed_table(
            cust, "b_customer", str(tmp_path / "c"), ["c_custkey"], 8,
            sort_cols=["c_custkey"],
        )
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        assert exchange_count(joined) == 0  # co-located: no shuffle at all
        # same join on the unbucketed scans shuffles both sides
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert exchange_count(plain) == 2
        # and results agree
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_layout_prunes_directories(spark, sf_dir, tmp_path):
    """write_partitioned_table + a partition-column predicate must show
    PartitionFilters in the scan and actually skip the other
    partitions' files — directory pruning, the time/source-locality
    twin of the bucketed join-locality proof above."""
    import os

    from pyspark.sql import functions as F

    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.plans import formatted_plan
    from flink_examples_spark.sources.readers import write_partitioned_table

    ev = load_table(spark, "events", sf_dir).withColumn(
        "dt", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_dt")
    write_partitioned_table(ev, path, ["dt"], sort_cols=["ts"])

    assert sum(1 for d in os.listdir(path) if d.startswith("dt=")) >= 2
    # the sort contract must survive the write (V1Writes would drop a
    # sort that doesn't lead with the partition columns): every file's
    # ts column must be non-decreasing
    import glob

    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(path, "dt=*", "*.parquet"))[:5]:
        ts = pq.read_table(f, columns=["ts"]).column("ts").to_pylist()
        assert ts == sorted(ts), f"unsorted file {f}"

    one_day = spark.read.parquet(path).filter(F.col("dt") == "2024-01-01")
    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters", 1)[1][:200]
    # row-level truth: pruned scan equals the unpartitioned filter
    expected = ev.filter(F.col("dt") == "2024-01-01").count()
    assert one_day.count() == expected and expected > 0
