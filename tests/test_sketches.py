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


def test_countmin_never_undercounts(spark, sf_dir):
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.operators.sketches import countmin_estimates

    events = load_table(spark, "events", sf_dir)
    est = {r.key: r.cms_est for r in
           countmin_estimates(events, "user_id").collect()}
    truth = {str(r.user_id): r.cnt for r in
             events.groupBy("user_id").agg(
                 __import__("pyspark.sql.functions", fromlist=["F"])
                 .count("*").alias("cnt")).collect()}
    assert est.keys() == truth.keys()
    assert all(est[k] >= truth[k] for k in truth)


def test_countmin_table_is_mergeable(spark):
    from pyspark.sql import functions as F
    from flink_examples_spark.operators.sketches import (
        countmin_estimates,
        countmin_table,
    )

    rows = [(i % 7,) for i in range(200)] + [(99,)] * 50
    half_a = spark.createDataFrame(rows[:120], "user_id long")
    half_b = spark.createDataFrame(rows[120:], "user_id long")
    df = half_a.unionByName(half_b)
    merged = (
        countmin_table(half_a, "user_id")
        .unionByName(countmin_table(half_b, "user_id"))
        .groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = countmin_estimates(df, "user_id")
    via_merge = countmin_estimates(df, "user_id", table=merged)
    a = {r.key: r.cms_est for r in whole.collect()}
    b = {r.key: r.cms_est for r in via_merge.collect()}
    assert a == b


def test_countmin_exact_when_no_collisions(spark):
    from flink_examples_spark.operators.sketches import countmin_estimates

    # 3 keys in a width-1024 sketch: collision probability over 4
    # independent rows is negligible and, with these fixed md5 hashes,
    # deterministically absent — estimates are exact.
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "user_id string")
    est = {r.key: r.cms_est for r in
           countmin_estimates(df, "user_id", width=1024).collect()}
    assert est == {"a": 5, "b": 3, "c": 1}


def test_kmv_exact_below_k_and_estimate_above(spark):
    from flink_examples_spark.operators.sketches import kmv_estimates

    # group 'small' has 10 distinct keys (< k=16) -> exact; group 'big'
    # has 500 distinct -> estimated within 60% (k=16 is coarse; the
    # bound here just pins that the estimate is in the right decade and
    # deterministic)
    rows = [("small", i) for i in range(10)] * 3 + [
        ("big", 1000 + i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, user string")
    out = {r.g: (r.n_kept, r.kmv_est) for r in
           kmv_estimates(df, "user", ["g"], k=16).collect()}
    assert out["small"] == (10, 10.0)
    n_kept, est = out["big"]
    assert n_kept == 16
    assert 200 < est < 800
    # determinism: same inputs partitioned differently -> same sketch
    out2 = {r.g: (r.n_kept, r.kmv_est) for r in
            kmv_estimates(df.repartition(7), "user", ["g"],
                          k=16).collect()}
    assert out == out2


def test_kmv_merge_equals_whole(spark):
    from flink_examples_spark.operators.sketches import kmv_estimates

    # min-k(A ∪ B) == min-k over the union of the halves' rows: feed
    # the halves through separate frames and union BEFORE the sketch;
    # partial min-k runs per partition so this exercises the merge path
    rows = [("g", f"u{i}") for i in range(300)]
    a = spark.createDataFrame(rows[:150], "g string, user string")
    b = spark.createDataFrame(rows[150:], "g string, user string")
    whole = kmv_estimates(
        spark.createDataFrame(rows, "g string, user string"),
        "user", ["g"], k=32,
    ).collect()[0]
    merged = kmv_estimates(
        a.unionByName(b), "user", ["g"], k=32
    ).collect()[0]
    assert (whole.n_kept, whole.kmv_est) == (merged.n_kept, merged.kmv_est)


def test_countmin_streaming_ingest_merges_and_replays(spark, tmp_path):
    from pyspark.sql import functions as F
    from flink_examples_spark.operators.sketches import countmin_table
    from flink_examples_spark.streaming.sinks import (
        compact_countmin_sketch,
        countmin_ingest_foreach_batch,
        read_countmin_sketch,
    )

    root = str(tmp_path / "cms")
    apply = countmin_ingest_foreach_batch(root, "user_id")
    b0 = spark.createDataFrame([(i % 5,) for i in range(40)], "user_id long")
    b1 = spark.createDataFrame([(i % 9,) for i in range(50)], "user_id long")
    apply(b0, 0)
    apply(b1, 1)

    def cells(df):
        return {(r.j, r.bucket): r.cnt for r in df.collect()}

    whole = cells(countmin_table(b0.unionByName(b1), "user_id"))
    assert cells(read_countmin_sketch(spark, root)) == whole

    # replay of the in-flight batch overwrites, never double-counts
    apply(b1, 1)
    assert cells(read_countmin_sketch(spark, root)) == whole

    # compaction folds committed batches, spares the newest, and the
    # folded sketch still reads identically
    b2 = spark.createDataFrame([(7,)] * 11, "user_id long")
    apply(b2, 2)
    n = compact_countmin_sketch(spark, root)
    assert n > 0
    import os
    subs = sorted(os.listdir(root))
    assert "batch=compacted" in subs and "batch=2" in subs
    assert "batch=0" not in subs
    whole3 = cells(
        countmin_table(b0.unionByName(b1).unionByName(b2), "user_id")
    )
    assert cells(read_countmin_sketch(spark, root)) == whole3
    # replaying the spared newest batch after compaction stays correct
    apply(b2, 2)
    assert cells(read_countmin_sketch(spark, root)) == whole3


def test_countmin_staged_table_unseen_key_reads_zero(spark):
    from flink_examples_spark.operators.sketches import (
        countmin_estimates,
        countmin_table,
    )

    day1 = spark.createDataFrame([("x",)] * 5, "user_id string")
    sketch = countmin_table(day1, "user_id")
    day2 = spark.createDataFrame([("x",), ("brandnew",)], "user_id string")
    est = {r.key: r.cms_est for r in
           countmin_estimates(day2, "user_id", table=sketch).collect()}
    assert est["x"] == 5
    assert est["brandnew"] == 0          # unseen key: estimate 0, not dropped


def test_kmv_null_keys_excluded_null_group_kept(spark):
    from flink_examples_spark.operators.sketches import kmv_estimates

    rows = [("a", "u1"), ("a", "u2"), ("a", None),
            (None, "u3"), (None, "u4"), (None, None)]
    df = spark.createDataFrame(rows, "g string, user string")
    out = {r.g: (r.n_kept, r.kmv_est) for r in
           kmv_estimates(df, "user", ["g"], k=16).collect()}
    # NULL keys don't count (COUNT DISTINCT semantics); NULL group is
    # a real group and must survive
    assert out == {"a": (2, 2.0), None: (2, 2.0)}


def test_read_countmin_sketch_missing_path_is_empty(spark, tmp_path):
    from flink_examples_spark.streaming.sinks import read_countmin_sketch

    out = read_countmin_sketch(spark, str(tmp_path / "never_written"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["j", "bucket", "cnt"]


def test_countmin_compaction_swap_is_crash_safe(spark, tmp_path):
    """The CMS sketch compaction shares the staging-swap machinery:
    a crash between the two renames must be healed by _recover_swap
    with the full cell history intact (counts identical before and
    after the simulated crash + recovery)."""
    import os as _os

    from flink_examples_spark.operators.sketches import countmin_table
    from flink_examples_spark.streaming.sinks import (
        _recover_swap,
        _staging_of,
        compact_countmin_sketch,
        countmin_ingest_foreach_batch,
        read_countmin_sketch,
    )

    root = str(tmp_path / "cms")
    apply = countmin_ingest_foreach_batch(root, "user_id")
    frames = [
        spark.createDataFrame([(i % k,) for i in range(30)],
                              "user_id long")
        for k in (3, 5, 7)
    ]
    for i, f in enumerate(frames):
        apply(f, i)
    whole = {(r.j, r.bucket): r.cnt
             for r in read_countmin_sketch(spark, root).collect()}

    # crash window mid-swap: root renamed aside, staging half-written
    _os.rename(root, root + ".old")
    _os.makedirs(_staging_of(root))
    _recover_swap(root)
    assert {(r.j, r.bucket): r.cnt
            for r in read_countmin_sketch(spark, root).collect()} == whole

    # and a real compaction after recovery still folds correctly
    assert compact_countmin_sketch(spark, root) > 0
    assert {(r.j, r.bucket): r.cnt
            for r in read_countmin_sketch(spark, root).collect()} == whole
    ref = {(r.j, r.bucket): r.cnt for r in countmin_table(
        frames[0].unionByName(frames[1]).unionByName(frames[2]),
        "user_id").collect()}
    assert whole == ref


def test_hll_registers_merge_by_max_equals_whole(spark):
    """The defining HLL property: registers built on split halves of a
    stream, merged by element-wise MAX, equal the whole-stream
    registers — so shard/day sketches fold without the raw data."""
    from flink_examples_spark.operators.sketches import hll_registers

    rows = [(f"u{i % 97}", "t") for i in range(500)]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    half_a = hll_registers(df.filter(F.expr("substr(user_id, 2) % 2 = 0")),
                           "user_id", ["event_type"])
    half_b = hll_registers(df.filter(F.expr("substr(user_id, 2) % 2 = 1")),
                           "user_id", ["event_type"])
    merged = {r.bucket: r.reg for r in (
        half_a.unionByName(half_b)
        .groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))
        .collect()
    )}
    whole = {r.bucket: r.reg
             for r in hll_registers(df, "user_id", ["event_type"]).collect()}
    assert merged == whole


def test_hll_estimate_tracks_exact_within_expected_error(spark):
    """Raw HLL error at m=64 is ~1.04/sqrt(64) = 13% RSD; assert the
    estimate lands within 4 sigma of truth at a cardinality well past
    the small-range regime, and sum_pow accounts every register
    (empty ones contribute 2^55 each: sum_pow <= 64 * 2^55)."""
    from flink_examples_spark.operators.sketches import hll_summary

    n = 5000
    df = spark.createDataFrame(
        [(f"user-{i}", "t") for i in range(n)],
        "user_id string, event_type string",
    )
    row = hll_summary(df, "user_id", ["event_type"]).collect()[0]
    assert row.n_buckets_set == 64  # 5000 keys saturate 64 buckets
    assert 0 < row.sum_pow <= 64 * (1 << 55)
    assert abs(row.hll_est - n) / n < 4 * 1.04 / 8.0


def test_hll_ingest_fold_equals_whole_and_replay_idempotent(
    spark, tmp_path
):
    """Per-batch HLL register tables folded by MAX == registers over
    the concatenated stream; replaying a batch (even one already
    compacted away) changes nothing — max is idempotent, the semantic
    the CMS twin does NOT have."""
    import os as _os

    from flink_examples_spark.operators.sketches import hll_registers
    from flink_examples_spark.streaming.sinks import (
        compact_hll_registers,
        hll_ingest_foreach_batch,
        read_hll_registers,
    )

    root = str(tmp_path / "hll")
    frames = [
        spark.createDataFrame(
            [(f"u{i}", "t") for i in range(lo, hi)],
            "user_id string, event_type string",
        )
        for lo, hi in [(0, 40), (20, 70), (60, 100)]
    ]
    apply = hll_ingest_foreach_batch(root, "user_id", ["event_type"])
    for i, f in enumerate(frames):
        apply(f, i)

    whole = {(r.event_type, r.bucket): r.reg for r in hll_registers(
        frames[0].unionByName(frames[1]).unionByName(frames[2]),
        "user_id", ["event_type"]).collect()}
    folded = {(r.event_type, r.bucket): r.reg for r in
              read_hll_registers(spark, root, ["event_type"]).collect()}
    assert folded == whole

    # compaction folds EVERYTHING (newest included) into one subdir
    assert compact_hll_registers(spark, root, ["event_type"]) > 0
    assert sorted(
        n for n in _os.listdir(root) if n.startswith("batch=")
    ) == ["batch=compacted"]
    assert {(r.event_type, r.bucket): r.reg for r in
            read_hll_registers(spark, root, ["event_type"]).collect()} \
        == whole

    # replay of an already-compacted batch: subdir recreated, fold
    # unchanged (idempotent max)
    apply(frames[1], 1)
    assert {(r.event_type, r.bucket): r.reg for r in
            read_hll_registers(spark, root, ["event_type"]).collect()} \
        == whole

    # missing path -> empty sketch, not a crash
    assert read_hll_registers(
        spark, str(tmp_path / "nope"), ["event_type"]).count() == 0


def test_presence_bitmap_exact_and_mergeable(spark):
    """Bitmap cardinality == COUNT(DISTINCT) exactly (including keys
    landing on bit 63 — the sign bit of the packed long), bitmaps from
    split halves bit_or-merge to the whole, and AND-popcount equals the
    true intersection size."""
    from flink_examples_spark.operators.bitmap import presence_bitmaps

    rows_a = [("g", k) for k in [0, 1, 63, 64, 127, 128, 4096, 63]]
    rows_b = [("g", k) for k in [1, 63, 200, 4096, 4097]]
    a = spark.createDataFrame(rows_a, "g string, k long")
    b = spark.createDataFrame(rows_b, "g string, k long")

    def card(bm):
        return bm.agg(F.sum(F.bit_count("word"))).collect()[0][0]

    assert card(presence_bitmaps(a, ["g"], "k")) == len(set(k for _, k in rows_a))
    # merge: bit_or of the halves' bitmaps == bitmap of the union
    merged = (
        presence_bitmaps(a, ["g"], "k")
        .unionByName(presence_bitmaps(b, ["g"], "k"))
        .groupBy("g", "word_idx").agg(F.bit_or("word").alias("word"))
    )
    assert card(merged) == len({k for _, k in rows_a} | {k for _, k in rows_b})
    # intersection via AND-popcount
    ba = presence_bitmaps(a, ["g"], "k").alias("x")
    bb = presence_bitmaps(b, ["g"], "k").alias("y")
    inter = (
        ba.join(bb, (F.col("x.word_idx") == F.col("y.word_idx"))
                & (F.col("x.g") == F.col("y.g")))
        .agg(F.sum(F.bit_count(
            F.col("x.word").bitwiseAND(F.col("y.word")))))
        .collect()[0][0]
    )
    assert inter == len({k for _, k in rows_a} & {k for _, k in rows_b})
    # nulls excluded, COUNT(DISTINCT) semantics
    with_null = spark.createDataFrame(
        [("g", None), ("g", 5)], "g string, k long")
    assert card(presence_bitmaps(with_null, ["g"], "k")) == 1

    # special-character key names parse (ADVICE r7: quote/backtick in
    # the name must not break the raise_error expression) and the
    # negative-key guard still fires through the quoted identifier
    import pytest

    weird = spark.createDataFrame(
        [("g", 3), ("g", 64)], "g string, `it's a ``key``` long")
    assert card(presence_bitmaps(weird, ["g"], "it's a `key`")) == 2
    neg = spark.createDataFrame([("g", -1)], "g string, `it's a ``key``` long")
    with pytest.raises(Exception, match="negative key"):
        presence_bitmaps(neg, ["g"], "it's a `key`").collect()


def test_bitmap_ingest_fold_equals_whole_and_replay_idempotent(
    spark, tmp_path
):
    """r7 (VERDICT #6): per-batch presence bitmaps folded by bit_or ==
    bitmaps over the concatenated stream EXACTLY (set-exact, unlike the
    HLL twin's estimate); replaying a batch — even one already
    compacted away — changes nothing (a ∪ a = a); compaction folds
    everything including the newest subdir and is itself idempotent."""
    import os as _os

    from flink_examples_spark.operators.bitmap import presence_bitmaps
    from flink_examples_spark.streaming.sinks import (
        bitmap_ingest_foreach_batch,
        compact_presence_bitmaps,
        read_presence_bitmaps,
    )

    root = str(tmp_path / "bm")
    frames = [
        spark.createDataFrame(
            [("d1" if k % 2 else "d2", k) for k in range(lo, hi)],
            "day string, user_key long",
        )
        for lo, hi in [(0, 90), (50, 170), (160, 260)]
    ]
    apply = bitmap_ingest_foreach_batch(root, "user_key", ["day"])
    for i, f in enumerate(frames):
        apply(f, i)

    whole_df = frames[0].unionByName(frames[1]).unionByName(frames[2])
    whole = {(r.day, r.word_idx): r.word for r in presence_bitmaps(
        whole_df, ["day"], "user_key").collect()}

    def folded():
        return {(r.day, r.word_idx): r.word for r in
                read_presence_bitmaps(
                    spark, root, ["day"], group_schema="day string"
                ).collect()}

    assert folded() == whole
    # the folded table answers the exact distinct census
    n_distinct = (
        read_presence_bitmaps(spark, root, ["day"],
                              group_schema="day string")
        .agg(F.sum(F.bit_count("word"))).collect()[0][0]
    )
    assert n_distinct == whole_df.select("day", "user_key").distinct().count()

    # compaction folds EVERYTHING (newest included) into one subdir
    assert compact_presence_bitmaps(spark, root, ["day"]) > 0
    assert sorted(
        n for n in _os.listdir(root) if n.startswith("batch=")
    ) == ["batch=compacted"]
    assert folded() == whole

    # compaction is idempotent: nothing new to fold -> no-op
    assert compact_presence_bitmaps(spark, root, ["day"]) == 0
    assert folded() == whole

    # replay of an already-compacted batch: subdir recreated, fold
    # unchanged (idempotent bit_or)
    apply(frames[1], 1)
    assert folded() == whole
    # and compacting the replayed subdir back in changes nothing
    assert compact_presence_bitmaps(spark, root, ["day"]) > 0
    assert folded() == whole

    # missing path -> empty bitmap table, not a crash
    assert read_presence_bitmaps(
        spark, str(tmp_path / "nope"), ["day"],
        group_schema="day string").count() == 0


def test_bitmap_ingest_through_real_stream(spark, tmp_path):
    """r7: the bitmap ingest driven by an ACTUAL availableNow streaming
    query (readStream -> foreachBatch), with in-flight compaction every
    2 batches — the folded table equals the whole-log batch bitmaps
    exactly, and a checkpointed RESTART over new files keeps it exact
    (replay-safe bit_or)."""
    import os as _os
    import time as _time

    import pandas as pd

    from flink_examples_spark.operators.bitmap import presence_bitmaps
    from flink_examples_spark.streaming.sinks import (
        bitmap_ingest_foreach_batch,
        read_presence_bitmaps,
    )
    from flink_examples_spark.streaming.sources import file_stream

    d = str(tmp_path / "in")
    _os.makedirs(d)
    now = _time.time() - 10
    frames = [
        pd.DataFrame({
            "day": ["d1" if k % 2 else "d2" for k in range(lo, hi)],
            "user_key": list(range(lo, hi)),
        })
        for lo, hi in [(0, 80), (40, 150), (140, 220)]
    ]
    for i, f in enumerate(frames[:2]):
        p = _os.path.join(d, f"{i:03d}.parquet")
        f.to_parquet(p, index=False)
        _os.utime(p, (now + i, now + i))

    root = str(tmp_path / "bm")
    ck = str(tmp_path / "ck")
    apply = bitmap_ingest_foreach_batch(
        root, "user_key", ["day"], compact_every_n_batches=2
    )

    def run():
        q = (
            file_stream(spark, d, _os.path.join(d, "000.parquet"))
            .writeStream.foreachBatch(apply)
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(180)

    run()

    def folded():
        return {(r.day, r.word_idx): r.word for r in
                read_presence_bitmaps(
                    spark, root, ["day"], group_schema="day string"
                ).collect()}

    two = pd.concat(frames[:2], ignore_index=True)
    whole2 = {(r.day, r.word_idx): r.word for r in presence_bitmaps(
        spark.createDataFrame(two), ["day"], "user_key").collect()}
    assert folded() == whole2

    # restart on the same checkpoint with one new file: only the new
    # file is ingested, the fold advances to the 3-frame whole
    p = _os.path.join(d, "002.parquet")
    frames[2].to_parquet(p, index=False)
    _os.utime(p, (now + 5, now + 5))
    run()
    three = pd.concat(frames, ignore_index=True)
    whole3 = {(r.day, r.word_idx): r.word for r in presence_bitmaps(
        spark.createDataFrame(three), ["day"], "user_key").collect()}
    assert folded() == whole3


def test_token_drift_ingest_fold_equals_batch_and_replay_idempotent(
    spark, sf_dir, tmp_path
):
    """r9 (VERDICT #2->#3): the drift monitor's streaming ingest —
    per-batch (source, token) count partials — assembles the EXACT
    integer TV of the registered source_token_tv_drift batch query
    (same rows, structural parity via operators.drift), survives a
    replayed in-flight batch without double-counting, and compaction
    (spare-newest, the additive-counts rule) changes nothing."""
    import os

    import __spark_entry__ as E
    from flink_examples_spark.streaming.sinks import (
        compact_token_counts,
        read_token_counts,
        read_token_tv_drift,
        token_counts_ingest_foreach_batch,
    )

    docs = load_table(spark, "documents", sf_dir).select("source", "text")
    batches = [
        docs.where(F.pmod(F.hash("text"), F.lit(3)) == i).localCheckpoint()
        for i in range(3)
    ]

    root = str(tmp_path / "tok_counts")
    apply = token_counts_ingest_foreach_batch(root)

    def drift():
        return {
            r.source: (r.n_tokens, r.tv_drift_ppm)
            for r in read_token_tv_drift(spark, root).collect()
        }

    apply(batches[0], 0)
    apply(batches[1], 1)
    apply(batches[2], 2)
    batch_rows = {
        r.source: (r.n_tokens, r.tv_drift_ppm)
        for r in E.queries()["source_token_tv_drift"](
            spark, sf_dir
        ).collect()
    }
    assert drift() == batch_rows

    # replay of the in-flight batch overwrites, never double-counts
    apply(batches[2], 2)
    assert drift() == batch_rows

    # compaction folds committed partials, spares the newest, and the
    # folded table still reads identically
    n = compact_token_counts(spark, root)
    assert n > 0
    subs = sorted(os.listdir(root))
    assert "batch=compacted" in subs and "batch=2" in subs
    assert "batch=0" not in subs and "batch=1" not in subs
    assert drift() == batch_rows
    # replaying the spared newest batch after compaction stays correct
    apply(batches[2], 2)
    assert drift() == batch_rows


def test_read_token_counts_missing_path_is_empty(spark, tmp_path):
    from flink_examples_spark.streaming.sinks import (
        read_token_counts,
        read_token_tv_drift,
    )

    out = read_token_counts(spark, str(tmp_path / "never_written"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["source", "token", "c_st"]
    # the drift reader over the empty table is empty, not a crash
    assert read_token_tv_drift(spark, str(tmp_path / "never_written")).count() == 0
