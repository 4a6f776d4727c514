"""User-journey analytics: ordered funnels and retention cohorts.

The event-stream counterpart of the corpus census operators: given a
``(user, ts, event_type)`` stream, answer "how far down an ordered
step sequence did each user get" (funnel) and "of the users first seen
on day D, how many were active D+k days later" (retention).

Both are one-exchange formulations. The funnel's per-step first-times
are cascaded conditional ``min(...) OVER (PARTITION BY user)`` windows
— every step reuses the single hash exchange on the user key (no sort:
the frame is the whole partition), and the final per-user rollup
groups on the same key, so Catalyst plans exactly one shuffle for the
whole funnel regardless of step count. Retention stamps each activity
row with its user's cohort day via the same partition-only window,
then aggregates (cohort, offset) — two exchanges total, both map-side
combinable. Neither joins events against events: at 100 TB the
self-join formulation (step k+1 ⋈ step k on user) would shuffle the
stream once per step and skew on hot users; the window formulation
shuffles once, and a hot user costs one fat partition row-scan, not a
join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_first_times(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user first completion time of each ordered funnel step.

    Step k counts only when it happens STRICTLY AFTER the user's first
    completion of step k-1 (the classic ordered funnel: a purchase
    before the first view does not convert the view→purchase edge).

    Output: one row per user seen in the stream, with one nullable
    timestamp column ``t_<step>`` per step; ``t_<k>`` is NULL iff the
    user never reached step k in order.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        # a duplicate step name would silently overwrite its t_<step>
        # column and emit ambiguous duplicate output columns
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    w = Window.partitionBy("user_key")
    df = events.select(
        F.col(user_col).alias("user_key"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    prev = None
    for step in steps:
        cond = F.col("_tp") == step
        if prev is not None:
            # NULL prev (user never reached step k-1) makes the
            # comparison NULL -> when() is false -> step k never fires,
            # which is exactly the ordered-funnel contract
            cond = cond & (F.col("_ts") > F.col(prev))
        col = f"t_{step}"
        df = df.withColumn(col, F.min(F.when(cond, F.col("_ts"))).over(w))
        prev = col
    return df.groupBy("user_key").agg(
        *[F.max(f"t_{s}").alias(f"t_{s}") for s in steps]
    )


def funnel_stage_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Funnel census: for each step, how many users reached it in order
    (a user reaching step k counts toward steps 1..k).

    Output: ``step_idx, step, n_users`` — monotonically non-increasing
    in ``step_idx`` by construction, one row per configured step.
    The per-step counts are conditional sums over the per-user
    first-times table, so the whole census is the funnel's single
    user-key exchange plus one scalar aggregation.
    """
    ft = funnel_first_times(events, user_col, ts_col, type_col, steps)
    counts = ft.agg(
        *[
            # coalesce: sum over an EMPTY stream is NULL, but a funnel
            # census must report 0 reached — the SQL count(CASE...)
            # semantics the oracle uses
            F.coalesce(
                F.sum(F.col(f"t_{s}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n_{i}")
            for i, s in enumerate(steps)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(pairs).alias("r")).select(
        F.col("r.step_idx").alias("step_idx"),
        F.col("r.step").alias("step"),
        F.col("r.n_users").alias("n_users"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset_days: int | None = None,
) -> DataFrame:
    """Day-grain retention matrix: users are cohorted by the calendar
    day of their first event; every (user, active day) pair then counts
    into ``(cohort_day, offset_days)`` where offset is whole days since
    the cohort day.

    Output: ``cohort_day date, offset_days int, n_users long`` — offset
    0 is the cohort size (every user is active on their first day).
    ``max_offset_days`` optionally truncates the matrix (dashboards
    rarely read past 90 days; the filter prunes before the final
    aggregation).

    Plan: cohort day is a partition-only window over the user key (one
    exchange, no sort), activity days dedupe and aggregate in the same
    pass — map-side partial aggs keep both shuffles proportional to
    distinct (user, day) / (cohort, offset), never raw event volume.
    """
    w = Window.partitionBy("user_key")
    stamped = events.select(
        F.col(user_col).alias("user_key"),
        F.to_date(ts_col).alias("day"),
    ).withColumn("cohort_day", F.min("day").over(w))
    act = (
        stamped.select(
            "user_key",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("offset_days"),
        )
        .distinct()
    )
    if max_offset_days is not None:
        act = act.filter(F.col("offset_days") <= max_offset_days)
    return act.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )
