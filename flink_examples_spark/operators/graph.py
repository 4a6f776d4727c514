"""Iterative graph propagation: PageRank-family random-walk mass in
EXACT integer arithmetic.

Classic PageRank is float-valued, which makes cross-engine equality
(and even run-to-run equality, via float sum order) unverifiable. This
operator reformulates the damped walk over integers so the fixpoint
iteration is bit-exact in any engine:

  - every node starts with ``init_mass`` integer units;
  - each iteration, a node sends ``floor(mass * damp * w(u,v) /
    W(u))`` units along each out-edge (edge-weight-proportional,
    damping folded into the numerator) and KEEPS the remainder — the
    1-damp share plus all floor residue stays put, a self-teleport
    variant of the damping term;
  - received mass sums exactly; total mass is conserved to the unit.

Rank ordering converges to the same heavy nodes PageRank finds (mass
concentrates where in-links concentrate), while every intermediate
table is integer — so the DuckDB oracle (the same recurrence unrolled
as CTEs) hash-matches exactly, the same contract as the rest of the
registry.

Scale shape: each iteration is one join of the mass vector against the
edge list (both keyed by src — co-partitioned after the first shuffle)
plus two map-side-combinable groupBys. Nothing is ever all-pairs; the
mass vector is |V| rows, the join is |E| rows. For billion-edge graphs
the edge list with its precomputed out-weight is the stageable
artifact. Iteration-in-driver-loop precedent: operators/iteration.py
(fib_iterate, D6) and the pointer-doubling connected components
(operators/dedup.py).

Reference parity: flink-examples has no graph operator (its iteration
example is the fibonacci stream, IterateExample.java) — this extends
the same §2.11 iteration capability to graph propagation per the
training-pipeline mandate (web-graph quality signals for corpus
curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def walk_mass(
    edges: DataFrame,
    iterations: int = 3,
    init_mass: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Run ``iterations`` rounds of integer damped-walk mass over
    ``edges`` (columns ``src, dst, w``; ``w`` a positive integer
    weight). Returns ``(node, mass)`` with
    Σ mass = |V| * init_mass exactly.

    Overflow headroom: the per-edge numerator is
    ``mass * damp_num * w`` ≤ |V|·init_mass·damp_num·w — with the
    defaults and a 10⁹-node graph that is ~10¹⁷·w, so keep
    ``init_mass`` modest for huge weighted graphs (the ranking only
    depends on the ratio mass/init_mass).
    """
    ew = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = edges.join(ew, "src").select("src", "dst", "w", "w_out")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # mass is referenced twice per round (contrib + kept), so without
    # truncation the plan doubles each iteration and analysis time
    # blows up past ~5 rounds — the hazard fib_steps_driver_loop
    # (operators/iteration.py) and the pointer-doubling CC guard
    # against. The edge table is pinned ONCE first so the per-round
    # checkpoint jobs never re-run the (possibly expensive) upstream
    # edge derivation — it is the stageable artifact anyway; measured
    # at sf0.1 this pair is FASTER than the untruncated single-job
    # plan (3.7 s vs 5.8 s: eight-way duplicated mass lineage costs
    # more in compile + redundant stages than the checkpoints cost in
    # jobs). Truncating on a >1 cadence instead trips an AQE
    # stage-reuse bug in Spark 4.1 ("Can't zip RDDs with unequal
    # numbers of partitions" when reused exchanges meet checkpointed
    # scans at differing plan depths) — do not "optimize" this back
    # to partial truncation.
    if iterations > 1:
        e = e.localCheckpoint(eager=True)
    mass = nodes.withColumn("mass", F.lit(init_mass).cast("long"))
    div = f"(mass * {damp_num} * w) div ({damp_den} * w_out)"
    for it in range(iterations):
        if it:
            mass = mass.localCheckpoint(eager=True)
        contrib = (
            mass.join(e, mass["node"] == e["src"])
            .select("src", "dst", F.expr(div).alias("c"))
        )
        # mass-delta union: new mass = old mass - Σ sent + Σ received,
        # folded in ONE map-side-combinable groupBy over (old mass rows
        # ∪ per-edge -c at src ∪ per-edge +c at dst). The previous
        # formulation materialized Σ sent as its own aggregate, LEFT
        # JOINed it back onto mass, and union-aggregated the receive
        # side — two extra exchanges per iteration for the identical
        # integer sum (r13 A/B x1.08 at sf0.1; at scale the saving is
        # two |V|-row shuffles per round).
        delta = mass.unionByName(
            contrib.select(
                F.col("src").alias("node"), (-F.col("c")).alias("mass")
            )
        ).unionByName(
            contrib.select(F.col("dst").alias("node"), F.col("c").alias("mass"))
        )
        mass = delta.groupBy("node").agg(F.sum("mass").alias("mass"))
    return mass


def transition_edges(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    node_col: str,
) -> DataFrame:
    """Weighted transition graph from an event log: per ``part_col``
    ordered by ``order_cols`` (a TOTAL order — include a unique
    tiebreak), every consecutive ``node_col`` pair becomes an edge;
    weight = transition count. One window pass + one count — the
    standard session-graph construction."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(*order_cols)
    return (
        df.select(
            F.col(node_col).alias("src"),
            F.lead(node_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle counting via degree-ordered edge orientation —
    ``(node, n_triangles)`` for every node in at least one triangle.

    The naive three-way edge self-join enumerates each triangle six
    times and, worse, fans out quadratically on high-degree hubs (a
    celebrity node with d followers contributes d^2 wedge candidates).
    The standard fix (Cohen 2009 MapReduce triangle counting /
    compact-forward): orient every undirected edge from the
    LOWER-degree endpoint to the higher (ties by id), so each triangle
    has exactly one "apex" node whose two out-edges form the wedge —
    every triangle is built exactly once, and wedge fan-out is bounded
    by sum of min-degree^2, the theoretically optimal bound, instead
    of max-degree^2.

    Plan shape: degrees = one map-side-combinable groupBy; orientation
    = two broadcast-or-shuffle joins of edges to the degree table;
    wedges = one self-join of the oriented list on the apex; closure =
    one join of wedges against oriented edges on the (b, c) pair.
    Nothing is ever all-pairs; every join key is an edge endpoint or
    an edge pair. Input edges may carry duplicates or both directions
    — they are canonicalized and deduped first.

    The canonical undirected list and the oriented list are each
    consumed by several downstream joins (und: degrees + orientation +
    the closing-edge lookup; oriented: both wedge sides), so both are
    pinned with ``localCheckpoint`` — un-pinned, every consumer
    re-derives the whole upstream edge derivation (for the co-purchase
    query that is the lineitem self-join: 24 scans / 42 Exchange nodes
    in the r13 profile; ReuseExchange deduped part of the runtime but
    the solo A/B still reads x1.23 — 2.87s -> 2.33s steady at sf0.1,
    mostly planning + AQE re-optimization over the duplicated
    subtrees). Both are |E|-row key tables — the linear-size artifact
    a 100 TB run would stage anyway, never the payload.
    """
    lo, hi = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient (a, b) from lower (degree, id) to higher — total order, so
    # the oriented graph is acyclic and each triangle has one apex
    da, db = F.col("da.d"), F.col("db.d")
    oriented = (
        und.join(deg.alias("da"), und["a"] == F.col("da.node"))
        .join(deg.alias("db"), und["b"] == F.col("db.node"))
        .select(
            F.when((da < db) | ((da == db) & (und["a"] < und["b"])),
                   F.struct(und["a"].alias("u"), und["b"].alias("v")))
            .otherwise(F.struct(und["b"].alias("u"), und["a"].alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=True)
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.u") == F.col("w2.u")) & (F.col("w1.v") < F.col("w2.v")),
    ).select(
        F.col("w1.u").alias("apex"),
        F.col("w1.v").alias("b"),
        F.col("w2.v").alias("c"),
    )
    # the closing edge is looked up in the CANONICAL undirected list
    # (a < b by id) — wedges already have b < c by construction
    tri = wedges.join(
        und,
        (wedges["b"] == und["a"]) & (wedges["c"] == und["b"]),
    ).select("apex", wedges["b"].alias("nb"), wedges["c"].alias("nc"))
    return (
        tri.select(F.explode(F.array("apex", "nb", "nc")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
