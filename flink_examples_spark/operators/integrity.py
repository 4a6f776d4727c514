"""Referential-integrity checks across tables.

The post-ingest report a data platform runs before anything downstream
trusts a snapshot: for each (left table, key) -> (right table, key)
relationship, how many left rows have no partner. One pass per check —
a left join against the DISTINCT right key set plus a null-flag sum,
so total and orphan counts come out of a single aggregate (no separate
count jobs, no row multiplication from duplicate right keys). At scale
each check is one shuffle on the key pair (or a broadcast when the
right key set is dim-sized — Catalyst picks); checks are independent
and union into one small report.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def orphan_check(
    name: str,
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
) -> DataFrame:
    """One integrity row: ``check_name, n_rows, n_orphans`` for left
    rows whose ``left_key`` has no match in right's ``right_key``.
    NULL left keys count as orphans (they reference nothing)."""
    rk = right.select(F.col(right_key).alias("__k")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    j = left.select(F.col(left_key).alias("__k")).join(rk, "__k", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.col("__hit").isNull().cast("long")), F.lit(0)
        ).alias("n_orphans"),
    ).select(
        F.lit(name).alias("check_name"), "n_rows", "n_orphans"
    )


def orphan_census(
    checks: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Union of ``orphan_check`` rows for a list of
    ``(name, left, left_key, right, right_key)`` relationships."""
    if not checks:
        raise ValueError("orphan_census: no checks given")
    out = None
    for name, left, lk, right, rk in checks:
        row = orphan_check(name, left, lk, right, rk)
        out = row if out is None else out.unionByName(row)
    return out


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column ingest profile: ``(col, n_rows, n_nulls,
    n_distinct)`` for each named column, in long format.

    ONE aggregation over ONE scan regardless of column count: all the
    per-column counters are expressions of the same ``agg`` call
    (Catalyst plans the multiple exact COUNT(DISTINCT)s as a single
    Expand + two-level aggregate — the scan is not repeated per
    column), then the single result row is unpivoted driver-free with
    ``stack``. The Deequ-style completeness/cardinality check a data
    platform runs after every ingest; exact counts, so the output is
    oracle-checkable (swap ``approx_count_distinct`` in at the 100 TB
    interactive tier if exactness isn't required).
    """
    if not cols:
        raise ValueError("column_profile: no columns given")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select("col", "n_rows", "n_nulls", "n_distinct")


def column_profile_partial(df: DataFrame, cols: Sequence[str],
                           k: int = 64) -> DataFrame:
    """MERGEABLE column profile partial: per column, exact
    ``(n_rows, n_nulls)`` plus the KMV kept-set (k smallest md5 hashes
    of the distinct values) instead of an exact distinct count —
    COUNT(DISTINCT) is the one profile metric that cannot be merged
    across shards/batches, the KMV kept-set can (min-k of unions ==
    min-k of min-k's). Output: ``(col, n_rows, n_nulls, kept
    array<long>)``; fold partials with :func:`column_profile_fold`.

    One pass: the frame is melted to (col, value) with ``stack`` and
    reduced by a single groupBy — the same single-scan discipline as
    [[column_profile]], traded against column-count×rows intermediate
    width (the streaming-partial context is batch-sized, where that
    trade is free)."""
    from flink_examples_spark.functions.text import hash60

    if not cols:
        raise ValueError("column_profile_partial: no columns given")
    stack = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in cols
    )
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (col, val)")
    )
    return melted.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).alias("n_nulls"),
        F.slice(
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("val").isNotNull(),
                        hash60(F.concat(F.col("val"), F.lit("#kmv"))),
                    )
                )
            ),
            1, k,
        ).alias("kept"),
    )


def column_profile_fold(partials: DataFrame, k: int = 64) -> DataFrame:
    """Fold :func:`column_profile_partial` outputs (any number of
    batches/shards) into the current profile: counts sum exactly, the
    distinct estimate comes from re-taking the k smallest hashes of
    the union of kept-sets (identical to a single-shot KMV over the
    whole data — tested). Output: ``(col, n_rows, n_nulls, n_kept,
    distinct_est double)``."""
    counts = partials.groupBy("col").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
    )
    kept = (
        partials.select("col", F.explode_outer("kept").alias("_h"))
        .filter(F.col("_h").isNotNull())
        .groupBy("col")
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k)
             .alias("_kept"))
    )
    two60 = float(1 << 60)
    n_kept = F.size("_kept")
    return (
        counts.join(kept, "col", "left")
        .select(
            "col", "n_rows", "n_nulls",
            F.coalesce(n_kept, F.lit(0)).alias("n_kept"),
            F.when(F.col("_kept").isNull(), F.lit(0.0))
            .when(n_kept < k, n_kept.cast("double"))
            .otherwise(
                F.lit(float(k - 1))
                / (F.element_at("_kept", k).cast("double")
                   / F.lit(two60))
            ).alias("distinct_est"),
        )
    )
