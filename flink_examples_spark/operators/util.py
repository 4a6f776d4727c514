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
