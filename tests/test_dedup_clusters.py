"""Connected-components clustering + canonical selection tests."""

from __future__ import annotations

from flink_examples_spark.operators.dedup import (
    connected_components,
    keep_canonical,
)


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} not present (no pairs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    out = {r.node: r.cluster_id for r in
           connected_components(pairs, "a", "b").collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_converge_on_hub_and_ring(spark):
    # ring 0-1-2-3-4-0 (diameter > 1 round) plus star 100-(101..105)
    ring = [(i, (i + 1) % 5) for i in range(5)]
    star = [(100, 100 + i) for i in range(1, 6)]
    pairs = spark.createDataFrame(ring + star, "a long, b long")
    out = {r.node: r.cluster_id for r in
           connected_components(pairs, "a", "b").collect()}
    assert {out[i] for i in range(5)} == {0}
    assert {out[100 + i] for i in range(6)} == {100}


def test_keep_canonical_drops_non_minimal_members(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 10, 11, 20)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    comp = connected_components(pairs, "a", "b")
    kept = sorted(r.doc_id for r in keep_canonical(docs, comp, "doc_id").collect())
    # clusters {1,2,3} -> keep 1; {10,11} -> keep 10; 20 unclustered -> kept
    assert kept == [1, 10, 20]
