"""Physical-plan inspection helpers.

The engine's 100 TB contract is enforced at the *plan* level: filters
must reach the scan, projections must prune, small dims must broadcast,
Python must stay out of relational pipelines. These helpers expose the
formatted physical plan as checkable facts, used by tests/test_plans.py
and available for ad-hoc audits (`.explain` grepping, productized).

The reference has no planner to audit (SURVEY.md §4 — every example IS
its physical plan); its manual idioms (filter-early HotItems.java:66-74,
broadcast-dim BroadcastDimension.java:100, pre-aggregation
HotItems.java:76-78) are exactly the properties asserted here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The plan `df.explain('formatted')` would print, as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names the plan's scans actually read."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for field in m.group(1).split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges) —
    the number every operator fights to minimize."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-boundary operators in the plan. Empty for relational
    pipelines; intentional for NFA/codec/stateful operators."""
    plan = formatted_plan(df)
    return [
        node
        for node in ("BatchEvalPython", "ArrowEvalPython",
                     "FlatMapGroupsInPandas", "MapInPandas",
                     "FlatMapGroupsInPandasWithState")
        if node in plan
    ]
