"""Key-value and bulk-index sink tests with injected fake clients.

The fake clients append JSONL to a shared temp directory (local mode —
executors share the filesystem), standing in for jedis / the ES REST
client. What's under test is the Spark-side contract: per-partition
client lifecycle, pipelined flush thresholds, full delivery.
"""

from __future__ import annotations

import json
import os

from flink_examples_spark.streaming.sinks import (
    bulk_index_foreach_batch,
    kv_hset_foreach_batch,
)


def _make_client_factory(out_dir: str):
    """Builds a picklable client factory. The class is defined inside the
    function so cloudpickle ships it by value to executors (the test
    module itself is not importable from Spark workers)."""

    class FileKVClient:
        """hset_many/bulk_index recorder; one output file per client id."""

        def __init__(self):
            self.path = os.path.join(
                out_dir, f"client-{os.getpid()}-{id(self)}.jsonl"
            )
            self.calls = 0

        def hset_many(self, hash_name, pairs):
            self.calls += 1
            with open(self.path, "a") as f:
                for k, v in pairs:
                    f.write(json.dumps({"h": hash_name, "k": k, "v": v,
                                        "call": self.calls}) + "\n")

        def bulk_index(self, index, docs):
            self.calls += 1
            with open(self.path, "a") as f:
                for doc_id, doc in docs:
                    f.write(json.dumps({"i": index, "id": doc_id, "doc": doc,
                                        "call": self.calls}) + "\n")

        def close(self):
            with open(self.path, "a") as f:
                f.write(json.dumps({"closed": True}) + "\n")

    return FileKVClient


def _read_all(out_dir):
    recs = []
    for fn in os.listdir(out_dir):
        with open(os.path.join(out_dir, fn)) as f:
            recs.extend(json.loads(line) for line in f)
    return recs


def test_kv_hset_sink_delivers_all_and_pipelines(spark, tmp_path):
    out_dir = str(tmp_path / "redis")
    os.makedirs(out_dir)
    df = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(25)], "k string, v string"
    ).repartition(2)
    write = kv_hset_foreach_batch(
        _make_client_factory(out_dir), "FLINK_REDIS_TEST", "k", "v",
        pipeline_size=10,
    )
    write(df, batch_id=0)
    recs = [r for r in _read_all(out_dir) if "k" in r]
    assert {r["k"] for r in recs} == {f"k{i}" for i in range(25)}
    assert all(r["h"] == "FLINK_REDIS_TEST" for r in recs)
    closes = [r for r in _read_all(out_dir) if r.get("closed")]
    assert len(closes) >= 1  # client closed per partition


def test_bulk_index_sink_documents(spark, tmp_path):
    out_dir = str(tmp_path / "es")
    os.makedirs(out_dir)
    df = spark.createDataFrame(
        [(i, f"user{i}", "pv") for i in range(7)],
        "id long, name string, behavior string",
    )
    write = bulk_index_foreach_batch(
        _make_client_factory(out_dir), "user-behavior", "id",
        ["name", "behavior"], bulk_actions=3,
    )
    write(df, batch_id=0)
    recs = [r for r in _read_all(out_dir) if "id" in r]
    assert {r["id"] for r in recs} == set(range(7))
    assert all(r["doc"]["behavior"] == "pv" for r in recs)
    # idempotent replay: same batch again -> same doc ids (upsert by id)
    write(df, batch_id=0)
    recs2 = [r for r in _read_all(out_dir) if "id" in r]
    assert {r["id"] for r in recs2} == set(range(7))


def test_transactional_foreach_batch_skips_replayed_epochs(spark, tmp_path):
    from flink_examples_spark.streaming.sinks import transactional_foreach_batch

    calls = []
    write = transactional_foreach_batch(
        lambda df, bid: calls.append((bid, df.count())),
        str(tmp_path / "commits"),
    )
    df = spark.createDataFrame([(1,), (2,)], "id long")
    write(df, 0)
    write(df, 0)   # replay of the same epoch -> skipped
    write(df, 1)
    assert calls == [(0, 2), (1, 2)]


def test_parquet_upsert_foreach_batch_merges_and_cleans_tmp(spark, tmp_path):
    """K6 upsert twin: last-write-wins per key, replay-idempotent, and
    the intermediate tmp directory is removed after a successful batch
    (ADVICE r1 sinks.py:125 leak)."""
    from flink_examples_spark.streaming.sinks import parquet_upsert_foreach_batch

    target = str(tmp_path / "tbl")
    write = parquet_upsert_foreach_batch(target, ["k"])
    write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
    write(spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string"), 1)
    got = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}
    # replay of the same epoch re-merges the same rows -> unchanged
    write(spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string"), 1)
    got2 = {(r.k, r.v) for r in spark.read.parquet(target).collect()}
    assert got2 == got
    assert [p for p in os.listdir(tmp_path) if ".tmp-" in p] == []
