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


# ---------------------------------------------------------------------------
# Hot-key canaries (VERDICT r4 next-round #2 and #6): the fixtures below
# exercise a genuinely hot key through the de-skewed dedup family and the
# salted-join path. Correctness fixtures always run; timing/imbalance
# canaries are env-gated like tests/test_scale_slope.py:
#     SPARK_GRAFT_SCALE_TESTS=1 python -m pytest tests/test_skew.py
# ---------------------------------------------------------------------------

import os
import time

import pytest

TIMING = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="timing/imbalance canary: set SPARK_GRAFT_SCALE_TESTS=1",
)

BOILERPLATE = (
    "Share this article | Home | About | Subscribe to our newsletter"
)


def _skewed_corpus(spark, n_docs: int, hot_frac: float = 1.0):
    """n_docs synthetic docs; a hot_frac share carry the SAME leading
    boilerplate paragraph (the C4/FineWeb hot-key shape), every doc
    also has one unique paragraph so survivorship is checkable."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % F.lit(max(1, round(1 / hot_frac)))) == 0,
            F.concat(
                F.lit(BOILERPLATE + "\n\nunique paragraph number "),
                F.col("id"),
            ),
        )
        .otherwise(
            F.concat(F.lit("unique paragraph number "), F.col("id"))
        )
        .alias("text"),
    )


def test_paragraph_dedup_hot_key_keep_first_exact(spark):
    """One paragraph duplicated 100k× (every doc) must be kept ONLY at
    doc 0 and stripped from all others, while each doc's unique
    paragraph survives — exact keep-first semantics under the exact
    skew the de-skewed rewrite targets."""
    from flink_examples_spark.operators.dedup import paragraph_dedup

    n = 100_000
    out = paragraph_dedup(
        _skewed_corpus(spark, n, hot_frac=1.0), "doc_id", "text"
    )
    agg = out.agg(
        F.sum("n_removed").alias("removed"),
        F.sum(
            F.col("text").contains(BOILERPLATE).cast("long")
        ).alias("with_boiler"),
        F.sum(
            F.col("text").contains("unique paragraph number ").cast("long")
        ).alias("with_unique"),
        F.count(F.lit(1)).alias("docs"),
    ).collect()[0]
    assert agg.docs == n
    assert agg.removed == n - 1  # hot paragraph stripped everywhere but once
    assert agg.with_boiler == 1
    assert agg.with_unique == n
    first = out.filter(F.col("doc_id") == 0).collect()[0]
    assert first.text.startswith(BOILERPLATE)


def test_substring_strip_hot_chunk_keep_first_exact(spark):
    """Same hot-key shape through the chunk-level strip: a 16-token
    boilerplate chunk shared by every doc survives exactly once."""
    from flink_examples_spark.operators.dedup import substring_dedup_strip

    n = 20_000
    hot = " ".join(f"tok{i}" for i in range(16))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(hot + " "),
            F.concat(F.lit("u"), F.col("id"), F.lit(" extra words here")),
        ).alias("text"),
    )
    out = substring_dedup_strip(docs, "doc_id", "text", k=16)
    agg = out.agg(
        F.sum("n_dropped").alias("dropped"),
        F.sum(
            F.col("kept_text").startswith(hot).cast("long")
        ).alias("with_hot"),
    ).collect()[0]
    assert agg.dropped == n - 1
    assert agg.with_hot == 1


@TIMING
def test_paragraph_dedup_skew_no_straggler_decade(spark):
    """The de-skew 'done' bar from VERDICT r4 #2: a corpus whose every
    doc shares one paragraph must not run an order of magnitude slower
    than a same-size corpus with no duplicate at all (the old
    content-keyed window funnels the hot fingerprint into a single
    reducer; the aggregate rewrite combines it map-side)."""
    from flink_examples_spark.operators.dedup import paragraph_dedup

    n = 1_000_000

    def run(hot_frac):
        # hot_frac=1.0 → one paragraph duplicated 10⁶×; tiny eps → none
        df = paragraph_dedup(
            _skewed_corpus(spark, n, hot_frac=hot_frac), "doc_id", "text"
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.agg(F.sum("n_removed")).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    uniform = run(1e-9)
    skewed = run(1.0)
    assert skewed <= max(3.0 * uniform, uniform + 5.0), (
        f"hot-key straggler: skewed={skewed:.2f}s uniform={uniform:.2f}s"
    )


@TIMING
def test_salted_join_hot_key_imbalance_bounded(spark):
    """salted_replicate_join against a genuinely hot key (50% of probe
    rows on ONE key): rows must match the naive join exactly, and the
    shuffle imbalance (max partition share) must be bounded — the naive
    join necessarily puts ≥50% of output in one partition, the salted
    join must spread the hot key across its n_salts sub-keys."""
    from flink_examples_spark.operators.skew import salted_replicate_join

    n, n_salts = 400_000, 8
    probe = spark.range(n).select(
        # 50% of rows land on key 0; the rest spread over 1000 keys
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )

    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get(
            "spark.sql.adaptive.enabled"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
    }
    try:
        # raw shuffle behavior: no AQE coalescing/skew-splitting, no
        # broadcast rescue — this measures the salting itself; 64
        # partitions so the n_salts hot sub-keys don't trivially
        # collide back into the test session's 8 buckets
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.shuffle.partitions", "64")

        def max_share(df):
            parts = (
                df.select(F.spark_partition_id().alias("pid"))
                .groupBy("pid")
                .count()
                .collect()
            )
            total = sum(p["count"] for p in parts)
            return max(p["count"] for p in parts) / total

        naive = probe.join(build, "k")
        salted = salted_replicate_join(
            probe, build, "k", n_salts=n_salts,
            probe_salt_source=["payload"],
        )
        assert salted.count() == naive.count() == n
        checksum = [F.sum(F.col("payload") + F.col("dim"))]
        assert salted.agg(*checksum).collect() == naive.agg(*checksum).collect()

        naive_share = max_share(naive)
        salted_share = max_share(salted)
        assert naive_share >= 0.5  # the fixture really is hot
        # even if two of the 8 hot sub-keys hash-collide into one
        # partition, the max share stays ~2×6.25% + base — far under
        # the naive join's ≥50% single-partition pile-up
        assert salted_share <= 0.20 and salted_share <= naive_share / 2, (
            f"salting did not spread the hot key: max partition share "
            f"{salted_share:.3f} (naive {naive_share:.3f})"
        )
    finally:
        for key, val in saved.items():
            spark.conf.set(key, val)


def test_range_partitioned_ntile_matches_native_window(spark):
    """range_partitioned_ntile == F.ntile over the same total order, on
    an adversarial fixture: uneven partition sizes (incl. n < k and
    n % k != 0), heavy value ties broken by a unique key, multi-slice
    range partitions."""
    from pyspark.sql import Window

    from flink_examples_spark.operators.skew import range_partitioned_ntile

    rows = []
    sizes = {"A": 1003, "B": 2, "C": 7, "D": 400}  # B: n < k edge case
    for g, n in sizes.items():
        for i in range(n):
            rows.append((g, (i * 37) % 50, i))  # heavy ties on v
    df = spark.createDataFrame(rows, "g string, v long, id long")

    got = range_partitioned_ntile(
        df, "g", ["v", "id"], n_tiles=4, num_ranges=6
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("band", F.ntile(4).over(w))
    assert (
        sorted(got.select("g", "v", "id", "band").collect())
        == sorted(want.select("g", "v", "id", "band").collect())
    )


def test_range_partitioned_ntile_no_low_cardinality_window(spark):
    """The physical plan must not contain a Window running over the
    full data keyed only by the 5-value partition column — the window
    that exists runs over (slice-id, key), bounded by range-partition
    size."""
    from flink_examples_spark.operators.skew import range_partitioned_ntile

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 17 % 23).alias("v"),
        F.col("id"),
    )
    out = range_partitioned_ntile(df, "g", ["v", "id"], 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            # the data-sized window must be partitioned by the slice id
            assert "__pid" in line, line


def test_range_partitioned_running_max_matches_native_window(spark):
    """range_partitioned_running_max == the exclusive global-order
    cummax window, on mixed asc/desc sort exprs with ties."""
    from pyspark.sql import Window

    from flink_examples_spark.operators.skew import (
        range_partitioned_running_max,
    )

    rows = [((i * 37) % 50, (i * 13) % 29, i) for i in range(1500)]
    df = spark.createDataFrame(rows, "x long, y long, id long")
    order = [F.col("x").asc(), F.col("y").desc(), F.col("id").asc()]
    got = range_partitioned_running_max(df, order, "y", num_ranges=7)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("run_max", F.max("y").over(w))
    key = lambda r: (r.x, r.y, r.id)  # noqa: E731
    assert sorted(((r.x, r.y, r.id, r.run_max)
                   for r in got.collect())) == \
        sorted(((r.x, r.y, r.id, r.run_max) for r in want.collect()))


def test_skyline_2d_matches_not_exists_spec_and_keeps_duplicates(spark):
    """skyline_2d == the quadratic NOT-EXISTS dominance spec, including
    duplicate frontier points (neither dominates the other)."""
    from flink_examples_spark.operators.topn import skyline_2d

    rows = [(i, (i * 7) % 40, (i * 11) % 25) for i in range(300)]
    rows += [(1000, rows[5][1], rows[5][2])]  # exact duplicate pair
    df = spark.createDataFrame(rows, "id long, price long, size long")
    got = {r.id for r in skyline_2d(df, "price", "size").collect()}

    data = [(i, p, s) for i, p, s in rows]
    want = {
        i for i, p, s in data
        if not any(
            q <= p and t >= s and (q < p or t > s) for _, q, t in data
        )
    }
    assert got == want and want  # non-vacuous
    # duplicates: if one copy is on the frontier, both are
    if rows[5][0] in want:
        assert 1000 in got


def test_skyline_plan_has_no_global_order_window_over_data(spark):
    """The only Window allowed to run over data-sized input must be
    partitioned by the slice id; the unpartitioned prefix window runs
    over slice summaries only (aggregate-first discipline)."""
    from flink_examples_spark.operators.topn import skyline_2d

    df = spark.range(2000).select(
        (F.col("id") * 17 % 97).alias("price"),
        (F.col("id") * 13 % 53).alias("size"),
        F.col("id"),
    )
    plan = (
        skyline_2d(df, "price", "size")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Window" in line and "max(size" in line:
            assert "__pid" in line, line


def test_round6_operators_tolerate_empty_input(spark):
    """Empty frames must flow through the r6 operators as empty
    results, not crashes — repartitionByRange/localCheckpoint on empty
    plans, degree joins on empty edges, bitmap/HLL aggregates with
    zero groups all have degenerate paths worth pinning."""
    from flink_examples_spark.operators.bitmap import presence_bitmaps
    from flink_examples_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
    )
    from flink_examples_spark.operators.graph import triangle_counts
    from flink_examples_spark.operators.sketches import hll_summary
    from flink_examples_spark.operators.skew import (
        range_partitioned_ntile,
        range_partitioned_running_max,
    )
    from flink_examples_spark.operators.topn import skyline_2d

    empty_kv = spark.createDataFrame([], "g string, v long, id long")
    assert range_partitioned_ntile(
        empty_kv, "g", ["v", "id"], 4, num_ranges=4).count() == 0
    assert range_partitioned_running_max(
        empty_kv, [F.col("v").asc()], "v", num_ranges=4).count() == 0
    assert skyline_2d(empty_kv, "v", "id").count() == 0
    assert triangle_counts(
        spark.createDataFrame([], "src long, dst long")).count() == 0
    assert presence_bitmaps(
        spark.createDataFrame([], "g string, k long"), ["g"], "k"
    ).count() == 0
    assert hll_summary(
        spark.createDataFrame([], "user_id string, event_type string"),
        "user_id", ["event_type"],
    ).count() == 0
    assert jaccard_prefix_filter_pairs(
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id", "text",
    ).count() == 0


def test_skyline_2d_non_broadcast_path_same_result(spark):
    """r7 size guard: with broadcast_threshold=0 every frontier counts
    as too large to broadcast, so the semi-join plans WITHOUT the hint
    (a shuffle join once AQE's auto-broadcast is disabled) and the
    result is identical — the anti-correlated-frontier escape hatch."""
    from flink_examples_spark.operators.topn import skyline_2d

    rows = [(i, (i * 7) % 40, (i * 11) % 25) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, price long, size long")
    base = {r.id for r in skyline_2d(df, "price", "size").collect()}

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guarded = skyline_2d(df, "price", "size", broadcast_threshold=0)
        plan = guarded._jdf.queryExecution().executedPlan().toString()
        # the frontier SEMI-join must not be broadcast (the tiny
        # slice-offset broadcast INSIDE range_partitioned_running_max
        # is expected and fine — it is num_ranges rows by construction)
        semi_broadcast = [
            ln for ln in plan.splitlines()
            if "LeftSemi" in ln and "Broadcast" in ln
        ]
        assert "LeftSemi" in plan and not semi_broadcast, plan
        got = {r.id for r in guarded.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == base and base


def test_presence_bitmaps_negative_key_raises(spark):
    """r7 contract guard: a negative key would silently corrupt the
    packed words (negative word_idx, negative shift) — it must fail
    loudly at execution instead."""
    import pytest

    from flink_examples_spark.operators.bitmap import presence_bitmaps

    df = spark.createDataFrame([("g", 5), ("g", -1)], "g string, k long")
    with pytest.raises(Exception, match="negative key"):
        presence_bitmaps(df, ["g"], "k").collect()


def test_presence_bitmaps_quoted_key_column_name(spark):
    """r7: key column names needing backticks (spaces, dashes) work —
    the expressions quote the name instead of raw interpolation."""
    from flink_examples_spark.operators.bitmap import presence_bitmaps

    df = (
        spark.createDataFrame([("g", 5), ("g", 64)], "g string, k long")
        .withColumnRenamed("k", "user id")
    )
    rows = {
        (r.word_idx, r.word)
        for r in presence_bitmaps(df, ["g"], "user id").collect()
    }
    assert rows == {(0, 1 << 5), (1, 1)}
