"""Skew mitigation: salting for hot keys (SURVEY.md §4 scale notes).

AQE's skew-join splitting handles most runtime skew; these helpers cover
the cases it can't:

- ``salted_two_stage_agg`` — aggregations whose partial state doesn't
  compress (``collect_list``, exact ``count_distinct``): one hot key
  funnels every row to a single reducer. Salting fans the key out to
  ``n_salts`` sub-groups, combines partials, then merges per real key —
  two small shuffles instead of one skewed one.
- ``salted_replicate_join`` — equi-join where the build side is too big
  to broadcast and one probe key is hot: replicate each build row to
  every salt, salt the probe rows randomly-but-deterministically, and
  join on (key, salt). Build-side cost ×n_salts buys probe-side fan-out
  of the hot key across n_salts reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the full row's
    natural identity columns — reproducible across retries (never
    ``rand()``, which breaks task-retry idempotency)."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_source: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    partial_aggs: name -> aggregate over raw rows (per key+salt).
    final_aggs:   name -> aggregate over the partial columns (per key).
    salt_source:  columns whose hash spreads the hot key (use a
                  high-cardinality payload column, not the group key).

    ``sum``/``count`` decompose as sum-of-sums / sum-of-counts;
    ``collect_list`` as flatten(collect_list(lists)); exact distinct as
    two-stage distinct. The caller picks the decomposition — the helper
    owns the salting plumbing.
    """
    keys = list(keys)
    salted = df.withColumn("__salt", _salt_col(salt_source, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )


def salted_replicate_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    probe_salt_source: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: build side replicated ×n_salts, probe side
    salted, join on (key, salt). Row-identical to ``probe.join(build,
    key, how)`` for inner/left joins (each probe row meets exactly one
    replica of each matching build row). Right/full joins are REFUSED:
    an unmatched build row exists as n_salts replicas and would emit
    n_salts null-padded duplicates."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_replicate_join: how={how!r} would duplicate "
            "unmatched build rows x n_salts; only inner/left joins are "
            "row-identical to the unsalted join"
        )
    if probe_salt_source is None:
        probe_salt_source = [c for c in probe.columns if c != key]
        if not probe_salt_source:
            raise ValueError(
                "salted_replicate_join: probe has no non-key columns to "
                "salt on — salting on the key alone gives every row of "
                "a hot key the SAME salt (one reducer still takes the "
                "whole key while paying full build replication); pass "
                "probe_salt_source explicitly"
            )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    build_rep = build.select("*", salts)
    probe_salted = probe.withColumn(
        "__salt", _salt_col(probe_salt_source, n_salts)
    )
    return (
        probe_salted.join(build_rep, on=[key, "__salt"], how=how)
        .drop("__salt")
    )
