"""As-of join + user-journey analytics (funnel, retention).

Semantics pins on hand-built micro-fixtures (tie-breaking, unmatched
rows, out-of-order steps) plus plan-shape assertions: the whole point
of the sorted-union as-of and window-cascade funnel is the single
key exchange — if Catalyst ever plans more, these operators lost
their 100 TB story.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from flink_examples_spark.operators.joins import asof_join
from flink_examples_spark.operators.journey import (
    funnel_first_times,
    funnel_stage_counts,
    retention_cohorts,
)
from flink_examples_spark.plans.inspect import exchange_count


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100, 1.0),
            (1, _ts("2024-01-01 10:00:05"), 101, 2.0),
            # two quotes at the SAME ts: max right_order (qid) must win
            (1, _ts("2024-01-01 10:00:10"), 102, 3.0),
            (1, _ts("2024-01-01 10:00:10"), 103, 4.0),
            (2, _ts("2024-01-01 10:00:07"), 200, 9.0),
        ],
        "k int, qts timestamp, qid int, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:59"), 11),  # before any quote
            (1, _ts("2024-01-01 10:00:05"), 12),  # ties a quote ts
            (1, _ts("2024-01-01 10:00:12"), 13),  # after the dup-ts pair
            (2, _ts("2024-01-01 10:00:06"), 21),  # before key-2's quote
            (3, _ts("2024-01-01 10:00:00"), 31),  # key with no quotes
        ],
        "k int, tts timestamp, tid int",
    )
    return quotes, trades


def test_asof_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, "k", "tts", "qts", ["qid", "px"], right_order="qid"
    )
    got = {r["tid"]: (r["qid"], r["px"]) for r in out.collect()}
    assert got[11] == (None, None)          # nothing at-or-before
    assert got[12] == (101, 2.0)            # equal-ts quote IS visible
    assert got[13] == (103, 4.0)            # same-ts pair: max qid wins
    assert got[21] == (None, None)          # right row is in the future
    assert got[31] == (None, None)          # key never quoted
    assert out.count() == trades.count()    # nothing dropped


def test_asof_single_exchange(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, "k", "tts", "qts", ["qid"])
    assert exchange_count(out) == 1, "sorted-union as-of must shuffle once"


def test_asof_matches_interval_formulation_when_bounded(spark, sf_dir):
    """On real data, the as-of result restricted to matches within 2h
    equals the interval-join + rank-1 formulation — two independent
    code paths, same semantics."""
    from flink_examples_spark.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    asof = (
        asof_join(p, c, "user_id", "ts", "cts", ["click_id", "cts"],
                  right_order="click_id")
        .filter(F.col("cts") >= F.col("ts") - F.expr("INTERVAL '2' HOUR"))
        .select("purchase_id", "click_id")
    )
    from pyspark.sql import Window

    cand = p.join(
        c,
        (p["user_id"] == c["user_id"])
        & (c["cts"] <= p["ts"])
        & (c["cts"] >= p["ts"] - F.expr("INTERVAL '2' HOUR")),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("cts"), F.desc("click_id")
    )
    ranked = (
        cand.select("purchase_id", "click_id", "cts")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "click_id")
    )
    a = {tuple(r) for r in asof.collect()}
    b = {tuple(r) for r in ranked.collect()}
    assert a == b


def test_funnel_ordered_semantics(spark):
    events = spark.createDataFrame(
        [
            # u1: full ordered journey
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:01:00"), "click"),
            (1, _ts("2024-01-01 10:02:00"), "purchase"),
            # u2: purchase BEFORE first click -> reaches click (10:01 is
            # after the view) but the 10:00:30 purchase can't convert
            (2, _ts("2024-01-01 10:00:00"), "view"),
            (2, _ts("2024-01-01 10:00:30"), "purchase"),
            (2, _ts("2024-01-01 10:01:00"), "click"),
            # u3: click with no prior view -> reaches nothing
            (3, _ts("2024-01-01 10:00:00"), "click"),
            # u4: same-ts view+click: strict > means click doesn't count
            (4, _ts("2024-01-01 10:00:00"), "view"),
            (4, _ts("2024-01-01 10:00:00"), "click"),
        ],
        "user_id int, ts timestamp, event_type string",
    )
    steps = ["view", "click", "purchase"]
    counts = {
        r["step"]: r["n_users"]
        for r in funnel_stage_counts(
            events, "user_id", "ts", "event_type", steps
        ).collect()
    }
    assert counts == {"view": 3, "click": 2, "purchase": 1}
    ft = {
        r["user_key"]: (r["t_view"], r["t_click"], r["t_purchase"])
        for r in funnel_first_times(
            events, "user_id", "ts", "event_type", steps
        ).collect()
    }
    assert ft[2][1] is not None and ft[2][2] is None  # click after, no purch
    assert ft[3] == (None, None, None)
    assert ft[4][1] is None  # strict ordering at equal ts


def test_funnel_single_key_exchange(spark, sf_dir):
    """The cascade reuses ONE user-key exchange; only the final scalar
    rollup adds a single-partition exchange."""
    from flink_examples_spark.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    out = funnel_stage_counts(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    assert exchange_count(out) <= 2


def test_retention_offset_zero_is_cohort_size(spark, sf_dir):
    """Every user is active on their first day, so the offset-0 column
    sums to the number of distinct users."""
    from flink_examples_spark.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    ret = retention_cohorts(events, "user_id", "ts")
    day0 = (
        ret.filter(F.col("offset_days") == 0)
        .agg(F.sum("n_users").alias("s"))
        .first()["s"]
    )
    n_users = events.select("user_id").distinct().count()
    assert day0 == n_users
    assert ret.filter(F.col("offset_days") < 0).count() == 0


def test_retention_max_offset_truncates(spark, sf_dir):
    from flink_examples_spark.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    ret = retention_cohorts(events, "user_id", "ts", max_offset_days=7)
    assert ret.agg(F.max("offset_days")).first()[0] <= 7


def test_journey_ops_handle_empty_inputs(spark):
    """Empty streams are routine (a quiet hour, a filtered-out
    partition): every journey/as-of op must return an empty or
    all-zero result, not crash."""
    import datetime as _dt

    from flink_examples_spark.operators.journey import retention_cohorts

    empty_ev = spark.createDataFrame(
        [], "user_id int, ts timestamp, event_type string"
    )
    steps = ["view", "click", "purchase"]
    counts = funnel_stage_counts(
        empty_ev, "user_id", "ts", "event_type", steps
    ).collect()
    assert [r["n_users"] for r in counts] == [0, 0, 0]
    assert funnel_first_times(
        empty_ev, "user_id", "ts", "event_type", steps
    ).count() == 0
    assert retention_cohorts(empty_ev, "user_id", "ts").count() == 0

    empty_l = spark.createDataFrame([], "k int, lts timestamp, lid int")
    empty_r = spark.createDataFrame([], "k int, rts timestamp, rid int")
    # empty left: nothing to enrich
    assert asof_join(
        empty_l, empty_r, "k", "lts", "rts", ["rid"]
    ).count() == 0
    # empty RIGHT, non-empty left: every left row survives with NULLs
    one_l = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 1), 7)], "k int, lts timestamp, lid int"
    )
    rows = asof_join(one_l, empty_r, "k", "lts", "rts", ["rid"]).collect()
    assert len(rows) == 1 and rows[0]["rid"] is None


def test_series_pattern_scan_goldens(spark):
    """Subsequence scan semantics: an exact pattern occurrence scores
    dist 0 at its start row; near misses score their squared gap;
    windows crossing a NULL value or running off the series end emit
    nothing; keys shorter than the pattern emit nothing."""
    from flink_examples_spark.operators.windows import series_pattern_scan

    rows = [
        # user 1: exact [1,2,3] at pos 0; [9,9,9] nowhere near
        (1, 0, 1.0), (1, 1, 2.0), (1, 2, 3.0), (1, 3, 9.0),
        # user 2: NULL splits the series: windows over it are skipped
        (2, 0, 1.0), (2, 1, None), (2, 2, 3.0), (2, 3, 1.0),
        (2, 4, 2.0), (2, 5, 3.5),
        # user 3: too short
        (3, 0, 1.0), (3, 1, 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, pos long, value double")
    got = {
        (r.user_id, r.pos): r.dist
        for r in series_pattern_scan(
            df, "user_id", ["pos"], "value",
            pattern=[1.0, 2.0, 3.0], max_dist=1.0,
        ).collect()
    }
    assert got == {(1, 0): 0.0, (2, 3): 0.25}  # 3.5 vs 3.0 -> 0.25


def test_scd2_islands_golden(spark, sf_dir):
    """Gaps-and-islands: consecutive same-value runs collapse into one
    interval; a value that RETURNS later starts a NEW interval; the
    current run has NULL valid_to."""
    import pandas as pd
    from flink_examples_spark.queries import registry

    out = registry()["user_attr_scd2"].spark_fn(spark, sf_dir).toPandas()
    one = out[out.user_id == out.user_id.iloc[0]].sort_values("valid_from")
    # intervals tile the timeline: each valid_to == next valid_from
    froms = list(one.valid_from)
    tos = list(one.valid_to)
    assert tos[:-1] == froms[1:]
    assert pd.isna(tos[-1])
    # no two ADJACENT intervals share a k (else they'd be one island)
    ks = list(one.k)
    assert all(a != b for a, b in zip(ks, ks[1:]))


def test_open_timeline_ends_at_zero_and_never_negative(spark, sf_dir):
    """Sweep-line invariants: every order opens and closes, so the
    running count returns to 0 at the final boundary and never dips
    below 0 anywhere."""
    from flink_examples_spark.queries import registry

    rows = (
        registry()["orders_open_timeline"]
        .spark_fn(spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    assert rows[-1].open_orders == 0
    assert min(r.open_orders for r in rows) >= 0
    assert max(r.open_orders for r in rows) > 0
