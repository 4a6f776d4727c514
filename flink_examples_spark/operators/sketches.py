"""Count-Min Sketch: fixed-size frequency summaries with deterministic,
engine-portable hashing.

Completes the classic sketch trio alongside HLL cardinality
(``count_distinct_daily_approx``, Spark's built-in
``approx_count_distinct``) and the Bloom membership filter
(``decontam_ngram_bloom``): CMS answers "how often does key x occur"
from ``depth × width`` integer cells regardless of corpus size
(Cormode & Muthukrishnan 2005).

The hashes are md5-derived ([[hash60]], functions/text.py) rather than
engine-native, which buys the property the rest of this repo is built
on: the WHOLE sketch — every cell, every estimate — is bit-exactly
reproducible in ANY engine, so the registry query is oracle-backed
(hash-exact vs DuckDB), not merely error-bounded. The standard CMS
guarantee still holds and is asserted in tests: estimate ≥ true count
always (no undercount is possible), and ≤ true + εN with probability
1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Scale shape: building the table is ONE map-side-combinable groupBy over
(row × depth) — the combine collapses to at most depth × width cells
per task before the exchange, so the shuffle is sketch-sized, not
data-sized; the table is mergeable across shards/days by cell-wise sum
(the reason CMS exists). Estimation joins probes against the tiny
table — broadcast by size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_examples_spark.functions.text import hash60


def _cells(df: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """(j, bucket) cell coordinates for every input row, one per hash
    row j: bucket_j(key) = hash60(key || '#cm' || j) % width."""
    j = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    return df.select(F.col(key_col).cast("string").alias("_k"), j).select(
        "j",
        (
            hash60(F.concat(F.col("_k"), F.lit("#cm"), F.col("j")))
            % width
        ).alias("bucket"),
        "_k",
    )


def countmin_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """The sketch itself: ``(j, bucket, cnt)`` — at most depth × width
    rows. Persist this tiny table once per shard/day and merge by
    cell-wise sum; estimates never need the raw data again."""
    return (
        _cells(df, key_col, depth, width)
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    table: DataFrame | None = None,
) -> DataFrame:
    """CMS estimate for every distinct key: min over the depth cells
    the key hashes to. Pass a staged ``table`` to estimate against a
    previously-built (possibly merged) sketch. Output:
    ``(key, cms_est)`` with cms_est ≥ the true count always.

    Cells absent from the sketch count as 0 (LEFT join + coalesce):
    against a staged table, a probe key the sketch never saw must
    report estimate 0 — an inner join would silently drop it, and a
    key with only SOME cells present would overstate by taking the min
    over the surviving non-zero cells only."""
    t = table if table is not None else countmin_table(
        df, key_col, depth, width
    )
    probes = _cells(
        df.select(key_col).distinct(), key_col, depth, width
    )
    return (
        probes.join(F.broadcast(t), ["j", "bucket"], "left")
        .groupBy(F.col("_k").alias("key"))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def kmv_estimates(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """K-Minimum-Values distinct-count sketch per group (Bar-Yossef et
    al. 2002): keep the ``k`` smallest ``hash60`` values of the key;
    estimate distinct = ``(k-1) / max_kept`` in hash-normalized space.

    Same engine-portability trick as [[countmin_table]]: the md5-derived
    hash makes the kept set — and therefore the ESTIMATE — bit-exact in
    any engine, so the registry query is oracle-backed where a native
    HLL sketch (``approx_count_distinct``) can only be error-bounded.
    The sketch is mergeable: union two kept-sets, re-take the k
    smallest (tested).

    Shape: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), so a
    per-PARTITION min-k partial (one Arrow pass, ≤ k rows emitted per
    group per partition, duplicate hashes deduped locally) bounds the
    shuffle to sketch-size — a plain ``collect_set``-then-slice would
    haul every distinct hash of every group through the exchange, the
    exact data-sized shuffle a sketch exists to avoid. Groups with < k
    distinct keys report their EXACT count (kept set is short), the
    standard KMV small-range behavior.

    Output: ``(*group_cols, n_kept, kmv_est double)`` — callers join
    truth alongside if they want the error exhibited.
    """
    import pandas as pd

    # NULL keys are excluded up front (COUNT(DISTINCT) semantics — the
    # oracle's COUNT(DISTINCT user_id) ignores NULLs too); this also
    # keeps ``_h`` non-nullable, so Arrow never widens the hash column
    # to float64 (hash60 values exceed float64's 2^53 integer range
    # and would silently corrupt the kept-set).
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols,
        hash60(
            F.concat(F.col(key_col).cast("string"), F.lit("#kmv"))
        ).alias("_h"),
    )

    def partial(batches):
        acc: dict[tuple, list] = {}
        for pdf in batches:
            # dropna=False: a NULL group VALUE is a real group (Spark
            # groupBy keeps it; so must the partial)
            for g, grp in pdf.groupby(group_cols, sort=False,
                                      dropna=False):
                gk = g if isinstance(g, tuple) else (g,)
                pool = grp["_h"].drop_duplicates()
                prev = acc.get(gk)
                if prev is not None:
                    pool = pd.concat([prev, pool]).drop_duplicates()
                acc[gk] = pool.nsmallest(k)
        if acc:
            yield pd.DataFrame(
                [(*gk, h) for gk, pool in acc.items() for h in pool],
                columns=[*group_cols, "_h"],
            )

    gtypes = dict(
        (f.name, f.dataType.simpleString()) for f in hashed.schema.fields
    )
    schema = ", ".join(
        [f"{c} {gtypes[c]}" for c in group_cols] + ["_h long"]
    )
    kept = (
        hashed.mapInPandas(partial, schema)
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_kept"))
    )
    two60 = float(1 << 60)
    return kept.select(
        *group_cols,
        F.size("_kept").alias("n_kept"),
        F.when(
            F.size("_kept") < k, F.size("_kept").cast("double")
        ).otherwise(
            F.lit(float(k - 1))
            / (F.element_at("_kept", k).cast("double") / F.lit(two60))
        ).alias("kmv_est"),
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 6,
) -> DataFrame:
    """HyperLogLog register table per group — ``(*group_cols, bucket,
    reg)`` with at most ``m = 2**p`` rows per group (Flajolet et al.
    2007), every value integer-exact and engine-portable.

    Spark's built-in ``approx_count_distinct`` is HLL++ but its sketch
    is opaque JVM state; this table IS the sketch, in plain columns:
    ``bucket = h % m``, ``reg = max over keys of rho(h div m)`` where
    ``rho`` = leading-zero count + 1 within the remaining 60-p bits,
    computed as ``55 - length(bin(w))`` (for p=6; ``bin`` renders
    minimal binary in both Spark and DuckDB, so the oracle reproduces
    every register bit-exactly — the same md5-portability discipline
    as [[countmin_table]] / [[kmv_estimates]]).

    Scale shape: one map-side-combinable groupBy (max) whose shuffle is
    at most m rows per task per group — sketch-sized, not data-sized;
    registers merge across shards/days by element-wise MAX, which is
    the whole point of HLL.
    """
    m = 1 << p
    rbits = 60 - p  # h is 60-bit (hash60); w = h div m has 60-p bits
    h = hash60(F.concat(F.col(key_col).cast("string"), F.lit("#hll")))
    w = F.expr(f"_h div {m}")
    rho = F.when(w == 0, F.lit(rbits + 1)).otherwise(
        F.lit(rbits + 1) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .select(
            *group_cols,
            F.pmod("_h", F.lit(m)).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_summary(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 6,
) -> DataFrame:
    """Fold the register table into the HLL raw estimate per group:
    ``(*group_cols, n_buckets_set, sum_pow, hll_est)``.

    ``sum_pow`` is the harmonic-sum denominator kept INTEGER-exact:
    ``sum over all m registers of 2**(rmax - reg)`` with ``rmax =
    60 - p + 1`` (empty registers contribute ``2**rmax`` each), so the
    only float op is the final ``alpha_m * m^2 * 2**rmax / sum_pow``
    division — one IEEE expression both engines evaluate identically.
    The small-range linear-counting correction is deliberately NOT
    applied (it needs ``ln``, whose last-ulp behavior is libm-specific
    and would break bit-exact oracles); callers see ``n_buckets_set``
    and can apply any correction policy downstream.
    """
    m = 1 << p
    rmax = 60 - p + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, key_col, group_cols, p)
    scale = float(alpha * m * m * (1 << rmax))
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_buckets_set"),
            (
                F.sum(F.expr(f"shiftleft(1L, {rmax} - reg)"))
                + (F.lit(m) - F.count(F.lit(1)))
                * F.lit(1 << rmax).cast("long")
            ).alias("sum_pow"),
        )
        .select(
            *group_cols,
            "n_buckets_set",
            "sum_pow",
            (F.lit(scale) / F.col("sum_pow").cast("double"))
            .alias("hll_est"),
        )
    )
