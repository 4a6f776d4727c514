"""Physical-plan inspection utilities (scale discipline tooling)."""

from flink_examples_spark.plans.inspect import (  # noqa: F401
    exchange_count,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    python_eval_nodes,
    read_schema_columns,
)
