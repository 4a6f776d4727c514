"""Every registry query must match its DuckDB oracle (the driver's t2 gate)."""

import pytest

from flink_examples_spark.queries import registry
from tests.oracle import compare

QUERIES = sorted(registry().items())


@pytest.mark.parametrize("name", [n for n, q in QUERIES if q.oracle is not None])
def test_query_matches_oracle(spark, sf_dir, name):
    q = registry()[name]
    res = compare(name, q.spark_fn(spark, sf_dir), q.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.exact_hash_match, f"{name} (hash-level divergence): {res.detail}"


@pytest.mark.parametrize("name", [n for n, q in QUERIES if q.oracle is None])
def test_rows_only_queries_run(spark, sf_dir, name):
    q = registry()[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
