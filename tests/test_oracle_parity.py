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


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
)
def test_fixture_doc_lengths_stay_under_oracle_series_cap(spark, sf):
    """Several oracles (winnow, decontam, wordcount shingles,
    corpus_pipeline) expand positions via ``generate_series(1, 4096)``
    while the Spark side is uncapped. A fixture document longer than the
    cap would make the oracle silently under-count and surface as a
    baffling hash mismatch — so pin the invariant: the longest document
    (chars AND whitespace tokens) stays at <=50% of the cap at every
    fixture scale the driver or bench touches.
    """
    from pyspark.sql import functions as F

    from flink_examples_spark.catalog import load_table

    docs = load_table(spark, "documents", sf)
    row = docs.agg(
        F.max(F.length("text")).alias("max_chars"),
        F.max(F.size(F.split(F.lower("text"), r"\s+"))).alias("max_toks"),
    ).first()
    assert row.max_chars <= 2048, f"{sf}: doc chars {row.max_chars} near cap"
    assert row.max_toks <= 2048, f"{sf}: doc tokens {row.max_toks} near cap"
