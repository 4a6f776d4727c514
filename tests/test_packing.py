"""Edge cases for sequence packing / chunking (operators/packing.py)
that the registry oracle can't isolate: exact-boundary bins, oversized
documents, divisible-length chunking."""

from __future__ import annotations

from flink_examples_spark.operators.packing import (
    chunk_documents,
    pack_stats,
    sequence_pack,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_overflow_and_boundary(spark):
    # target=4: doc1 (3 tok) starts bin 0; doc2 (3 tok) has exclusive
    # prefix 3 < 4 so it ALSO lands in bin 0 (overflowing to 6 — the
    # documented streaming-pack semantics); doc3's prefix is 6 -> bin 1.
    # doc4's prefix is 8, exactly 2*target -> opens bin 2, proving the
    # exact-boundary prefix starts a fresh bin.
    df = _docs(
        spark,
        [
            (1, "s", "a b c"),
            (2, "s", "d e f"),
            (3, "s", "g h"),
            (4, "s", "i j"),
        ],
    )
    packed = {
        r["doc_id"]: r["pack_id"]
        for r in sequence_pack(df, "doc_id", "text", 4, "source").collect()
    }
    assert packed == {1: 0, 2: 0, 3: 1, 4: 2}
    stats = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
        for r in pack_stats(
            sequence_pack(df, "doc_id", "text", 4, "source"), "source"
        ).collect()
    }
    assert stats == {("s", 0): (2, 6), ("s", 1): (1, 2), ("s", 2): (1, 2)}


def test_pack_oversized_doc_gets_own_bin_span(spark):
    # a single doc larger than target occupies bins by itself; the NEXT
    # doc's prefix (7) falls in bin floor(7/4)=1, sharing no bin with it
    df = _docs(spark, [(1, "s", "a b c d e f g"), (2, "s", "x y")])
    packed = {
        r["doc_id"]: r["pack_id"]
        for r in sequence_pack(df, "doc_id", "text", 4, "source").collect()
    }
    assert packed == {1: 0, 2: 1}


def test_pack_partitions_are_independent(spark):
    df = _docs(spark, [(1, "s1", "a b c"), (2, "s2", "d e f")])
    packed = sequence_pack(df, "doc_id", "text", 4, "source").collect()
    assert {r["pack_id"] for r in packed} == {0}


def test_sharded_pack_invariants_and_per_shard_parity(spark):
    """The sharded (source × hash-bucket) packing shape — what a 100 TB
    corpus actually runs — preserves every packing invariant per
    (source, shard) key: one output row per doc, token conservation,
    and pack_id == floor(exclusive-prefix/target) in doc_id order
    within each shard."""
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.functions.text import token_count
    from flink_examples_spark.operators.packing import sequence_pack_sharded
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    target, n_shards = 64, 4
    packed = sequence_pack_sharded(
        docs, "doc_id", "text", target, "source", n_shards=n_shards
    ).collect()

    # exactly one row per doc; tokens conserved
    assert len(packed) == docs.count()
    total = docs.agg(F.sum(token_count("text"))).first()[0]
    assert sum(r["n_tokens"] for r in packed) == total
    # shards actually fan out (the point of the shape)
    assert {r["pack_shard"] for r in packed} == set(range(n_shards))

    # per-(source, shard) prefix-sum semantics hold independently
    groups: dict[tuple, list] = {}
    for r in packed:
        groups.setdefault((r["source"], r["pack_shard"]), []).append(r)
    for rows in groups.values():
        prefix = 0
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["pack_id"] == prefix // target, rows
            prefix += r["n_tokens"]


def test_chunk_exact_multiple_has_no_empty_tail(spark):
    df = _docs(spark, [(1, "s", "a b c d e f")])
    rows = chunk_documents(df, "doc_id", "text", 3).collect()
    assert [(r["chunk_idx"], r["n_chunk_tokens"]) for r in
            sorted(rows, key=lambda r: r["chunk_idx"])] == [(0, 3), (1, 3)]


def test_chunk_short_tail_and_single_token(spark):
    df = _docs(spark, [(1, "s", "a b c d e"), (2, "s", "z")])
    rows = chunk_documents(df, "doc_id", "text", 3).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["n_chunk_tokens"])
    assert by_doc == {1: [3, 2], 2: [1]}


def test_chunk_hashes_distinguish_content(spark):
    df = _docs(spark, [(1, "s", "a b c a b c"), (2, "s", "a b c a b d")])
    rows = chunk_documents(df, "doc_id", "text", 3).collect()
    h = {(r["doc_id"], r["chunk_idx"]): r["chunk_hash"] for r in rows}
    assert h[(1, 0)] == h[(1, 1)] == h[(2, 0)]  # identical token windows
    assert h[(2, 1)] != h[(2, 0)]


def test_pack_target_and_chunk_guards_and_null_id_shard(spark):
    """Review regressions: non-positive target/chunk_tokens raise
    instead of silently NULLing/emptying output; NULL-id docs hash to a
    real shard (sentinel), not a collapsed NULL straggler window."""
    import pytest

    from flink_examples_spark.operators.packing import (
        chunk_documents,
        sequence_pack,
        sequence_pack_sharded,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (None, "d e f", "s")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="target"):
        sequence_pack(docs, "doc_id", "text", target=0, partition_col="source")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
    out = sequence_pack_sharded(
        docs, "doc_id", "text", target=4, partition_col="source"
    ).collect()
    assert all(r["pack_shard"] is not None for r in out)


def test_length_bucket_cap_boundaries_and_degenerates(spark):
    """Bucket caps are inclusive upper bounds from the fixed ladder,
    degenerate docs (NULL/empty/whitespace) get a NULL cap, and counts
    above the top cap clamp to it."""
    from flink_examples_spark.operators.packing import length_bucket_census

    rows = [
        (1, "one", "s"),                       # 1 token  -> cap 16
        (2, " ".join(["w"] * 16), "s"),        # 16       -> cap 16 (inclusive)
        (3, " ".join(["w"] * 17), "s"),        # 17       -> cap 32
        (4, " ".join(["w"] * 3000), "s"),      # 3000     -> clamps to 2048
        (5, None, "s"),                        # NULL     -> NULL cap
        (6, "   ", "s"),                       # 0 tokens -> NULL cap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["cap"]: (r["n_docs"], r["sum_tokens"], r["pad_tokens"])
           for r in length_bucket_census(df, "text", "source").collect()}
    assert got[16] == (2, 17, 15)          # 1 + 16 tokens, pad 32-17
    assert got[32] == (1, 17, 15)
    assert got[2048] == (1, 3000, -952)    # clamped: pad goes negative,
    #                                        the signal "chunk these first"
    assert got[None] == (2, 0, None)       # degenerate rows stay visible


def test_pack_window_spans_brute_force(spark):
    """pack_window_spans vs a hand-computed token stream: docs occupy
    [prefix, prefix+n) in id order; win range = floor-div endpoints;
    empty docs are excluded (no tokens, and their degenerate span would
    be a descending sequence)."""
    from flink_examples_spark.operators.packing import pack_window_spans

    rows = [
        (1, "s", "a b c"),          # [0,3)  -> wins 0..0
        (2, "s", "d e f g"),        # [3,7)  -> wins 0..1 (crosses 5)
        (3, "s", ""),               # empty: excluded
        (4, "s", "h i j k l m"),    # [7,13) -> wins 1..2
        (5, "t", "x y z w v u t s r q p o"),  # [0,12) -> wins 0..2
    ]
    out = {
        r.doc_id: (r.n_tokens, r.win_first, r.win_last)
        for r in pack_window_spans(
            _docs(spark, rows), "doc_id", "text", 5, "source"
        ).collect()
    }
    assert out == {
        1: (3, 0, 0),
        2: (4, 0, 1),
        4: (6, 1, 2),
        5: (12, 0, 2),
    }


def test_pack_window_spans_rejects_bad_target(spark):
    import pytest

    from flink_examples_spark.operators.packing import pack_window_spans

    with pytest.raises(ValueError):
        pack_window_spans(_docs(spark, []), "doc_id", "text", 0, "source")
