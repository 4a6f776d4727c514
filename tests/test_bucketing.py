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


def test_snapshot_diff_on_bucketed_snapshots_is_exchange_free(
    spark, sf_dir, tmp_path, no_broadcast
):
    """diff.py's scale claim, proven at the plan level: two corpus
    snapshots bucketed on the id column diff with ZERO exchanges — the
    full-outer fingerprint join zips matching bucket files, so a daily
    100 TB snapshot audit never reshuffles either snapshot. Verdicts
    must equal the unbucketed diff's."""
    from pyspark.sql import functions as F

    from flink_examples_spark.operators.diff import snapshot_diff

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    v1 = docs.filter(F.col("doc_id") % 7 != 0)
    v2 = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" edited")))
        .otherwise(F.col("text")),
    )
    try:
        write_bucketed_table(
            v1, "snap_v1", str(tmp_path / "v1"), ["doc_id"], 8,
            sort_cols=["doc_id"],
        )
        write_bucketed_table(
            v2, "snap_v2", str(tmp_path / "v2"), ["doc_id"], 8,
            sort_cols=["doc_id"],
        )
        bucketed = snapshot_diff(
            spark.table("snap_v1"), spark.table("snap_v2"), "doc_id", "text"
        )
        assert exchange_count(bucketed) == 0
        plain = snapshot_diff(v1, v2, "doc_id", "text")
        assert exchange_count(plain) == 2  # both sides reshuffled
        got = {r.doc_id: r.verdict for r in bucketed.collect()}
        want = {r.doc_id: r.verdict for r in plain.collect()}
        assert got == want
        assert set(want.values()) == {"added", "removed", "changed",
                                      "unchanged"}  # all verdicts exercised
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_v1")
        spark.sql("DROP TABLE IF EXISTS snap_v2")


def test_staged_band_index_self_joins_exchange_free(
    spark, sf_dir, tmp_path, no_broadcast
):
    """dedup.py's staging claim, proven at the plan level: the MinHash
    band-key table persisted bucketed on its join key self-joins with
    ZERO exchanges — so a staged 100 TB corpus band index generates LSH
    candidates without ever reshuffling. Pairs must equal the in-memory
    LSH join's."""
    from flink_examples_spark.operators.dedup import (
        minhash_band_keys,
        minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    bands = minhash_band_keys(docs, "doc_id", "text")
    try:
        # bucket on BOTH join keys: a band_key-only bucketing leaves the
        # planner unable to line buckets up with the (band, band_key)
        # join and it falls back to a full shuffle
        write_bucketed_table(
            bands, "band_idx", str(tmp_path / "b"), ["band", "band_key"],
            8, sort_cols=["band", "band_key"],
        )
        b = spark.table("band_idx")
        joined = b.alias("a").join(
            b.alias("c"),
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.band_key") == F.col("c.band_key"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        assert exchange_count(joined) == 0  # zipped bucket files, no shuffle
        # columns: [doc_id, band, band_key] x2; the set comparison
        # absorbs the multi-band duplicates that minhash_lsh_pairs'
        # trailing distinct() removes
        got = {(r[0], r[3]) for r in joined.collect()}
        want = {(r.doc_a, r.doc_b)
                for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
        assert got == want and got
    finally:
        spark.sql("DROP TABLE IF EXISTS band_idx")


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
