"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship HotItems-style sliding-window top-N
(SURVEY.md §7.2) on sf0.001. ``queries()`` / ``oracle_sql()`` expose every
implemented SURVEY.md §2 operator as a (Spark DataFrame, DuckDB oracle
SQL) pair; see flink_examples_spark/queries.py for the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_examples_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_examples_spark.catalog import load_table
    from flink_examples_spark.operators.topn import hot_items

    return hot_items(load_table(spark, "events", "/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checkable query."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
