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
