"""Integer damped-walk mass (operators/graph.py) goldens + invariants."""

from __future__ import annotations

from flink_examples_spark.operators.graph import transition_edges, walk_mass


def _masses(df):
    return {r.node: r.mass for r in df.collect()}


def test_two_cycle_is_stationary(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1)], "src long, dst long, w long"
    )
    assert _masses(walk_mass(edges, iterations=3)) == {
        1: 1_000_000, 2: 1_000_000
    }


def test_sink_accumulates_hand_golden(spark):
    # 1 -> 2 only; two iterations, damp 85/100:
    #   it1: 1 sends 850_000, keeps 150_000; 2 keeps 1_000_000 + recv
    #   it2: 1 sends floor(150_000*0.85)=127_500, keeps 22_500
    edges = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    assert _masses(walk_mass(edges, iterations=2)) == {
        1: 22_500, 2: 1_977_500
    }


def test_weighted_fanout_floor_division(spark):
    # 1 -> 2 (w=3), 1 -> 3 (w=1): sends are weight-proportional with
    # floor division; sinks keep their initial mass.
    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "src long, dst long, w long"
    )
    out = _masses(walk_mass(edges, iterations=1))
    assert out == {1: 150_000, 2: 1_637_500, 3: 1_212_500}


def test_mass_conserved_on_random_graph(spark):
    import itertools

    pairs = [(a, b, (a * 7 + b) % 5 + 1)
             for a, b in itertools.product(range(8), range(8)) if a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long, w long")
    out = _masses(walk_mass(edges, iterations=4))
    assert sum(out.values()) == 8 * 1_000_000


def test_transition_edges_golden(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"),
        ("u2", 1, "a"), ("u2", 2, "b"),
    ]
    df = spark.createDataFrame(rows, "user string, ts long, node string")
    out = {(r.src, r.dst): r.w for r in
           transition_edges(df, "user", ["ts"], "node").collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 1}
