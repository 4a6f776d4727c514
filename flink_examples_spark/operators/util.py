"""Shared operator plumbing.

``keyed_python_partitions`` exists because AQE sizes shuffle partitions
by *bytes*, which is right for JVM stages but wrong for Python-heavy
``applyInPandas`` stages: a few MB of Arrow batches can carry seconds of
Python CPU, and AQE happily coalesces them onto 2 tasks. An explicit
``repartition(n, keys)`` pins the partition count (user-specified
repartitions are exempt from AQE coalescing) and already satisfies the
downstream group-by's distribution requirement, so no second exchange is
inserted.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def keyed_python_partitions(
    df: DataFrame,
    keys: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-partition ``df`` by ``keys`` with a pinned partition count
    (default: the cluster's default parallelism) so a following
    Python-UDF group-by stage uses every core instead of whatever AQE
    coalesces byte-wise."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(num_partitions, *keys)


def schema_col_names(ddl: str) -> list[str]:
    """Column names from a DDL schema string, splitting on TOP-LEVEL
    commas only — a naive ``split(",")`` mangles parametrized types
    (``decimal(18,2)``, ``map<string,long>``, ``struct<...>``) into
    phantom columns."""
    names: list[str] = []
    depth, cur = 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            names.append("".join(cur).strip().split()[0])
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        names.append(tail.split()[0])
    return names


def grouped_map_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    fn,
    output_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run a per-group pandas function through ONE ``mapInPandas`` pass
    instead of ``groupBy().applyInPandas`` — same results, less
    per-group machinery.

    ``applyInPandas`` materializes a separate Arrow batch and pandas
    DataFrame per GROUP on both sides of the boundary; with thousands
    of small keys that per-group overhead dominates the actual Python
    work (r13 profile: a no-op applyInPandas over the 1,500-user events
    table cost 1.03s vs 0.66s for the same rows in 64 groups; the CEP
    NFA A/B'd x1.14 end-to-end from this switch alone). Here rows are
    hash-partitioned by ``keys`` (explicit count — exempt from AQE
    byte-wise coalescing, same contract as
    :func:`keyed_python_partitions`), sorted WITHIN partitions by
    ``keys + order`` in the JVM, and groups are carved out of the
    streamed batches with a vectorized key-change scan. ``fn(key_tuple,
    group_pdf)`` keeps the exact applyInPandas contract (it may sort,
    filter, or return any number of rows); a group whose rows span
    batch boundaries is carried forward, so Python peak memory is
    O(batch + largest group), the same bound applyInPandas gives.

    Null keys: the change mask treats NaN == NaN (pandas upcasts
    nullable int keys to float), matching groupBy's null-equality.
    """
    import numpy as np
    import pandas as pd

    pcols = list(keys)
    ocols = list(order)

    def run_part(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            change = np.zeros(len(pdf), dtype=bool)
            change[0] = True
            for c in pcols:
                v = pdf[c].to_numpy()
                neq = v[1:] != v[:-1]
                both_na = pd.isna(v[1:]) & pd.isna(v[:-1])
                change[1:] |= neq & ~both_na
            starts = np.flatnonzero(change)
            # the last group may continue into the next batch: carry it
            carry = pdf.iloc[starts[-1]:]
            for s, e in zip(starts[:-1], starts[1:]):
                g = pdf.iloc[s:e].reset_index(drop=True)
                out = fn(tuple(g.iloc[0][c] for c in pcols), g)
                if out is not None and len(out):
                    yield out
        if carry is not None and len(carry):
            g = carry.reset_index(drop=True)
            out = fn(tuple(g.iloc[0][c] for c in pcols), g)
            if out is not None and len(out):
                yield out

    parts = keyed_python_partitions(df, pcols, num_partitions)
    return parts.sortWithinPartitions(*pcols, *ocols).mapInPandas(
        run_part, output_schema
    )
