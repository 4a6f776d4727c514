"""Flagship scaling-slope canary (VERDICT r3 next-round #5).

A fixed-sf bench structurally cannot catch quadratic creep — a pipeline
that is accidentally O(n²) can still look fine at one scale. This test
runs the three flagship pipelines at sf0.001 / sf0.01 / sf0.1 (100x row
span) and asserts wall-time grows at most ~1.5x the row-count ratio.
A genuinely quadratic path would grow ~100x the row ratio over this
span; the 1.5x headroom absorbs fixed session overhead and box noise.

Env-gated like tools/scale_canary.py (timing asserts are flaky under
parallel CI load): run with

    SPARK_GRAFT_SCALE_TESTS=1 python -m pytest tests/test_scale_slope.py

Last green run: 2026-08-14 (ratios recorded in the assert message on
failure).
"""

from __future__ import annotations

import os
import time

import pytest

from flink_examples_spark.catalog import load_table

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

FLAGSHIPS = [
    "corpus_pipeline_packs",
    "corpus_pipeline_hygiene_v2",
    "dedup_pipeline_keep",
]

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="timing canary: set SPARK_GRAFT_SCALE_TESTS=1 to run",
)


@pytest.mark.parametrize("name", FLAGSHIPS)
def test_flagship_walltime_tracks_rowcount(spark, name):
    from flink_examples_spark.queries import registry

    q = registry()[name]
    # warm: session, Arrow workers, and the query's own first-run JIT
    q.spark_fn(spark, SF_DIRS[0]).collect()

    rows, secs = [], []
    for sf_dir in SF_DIRS:
        rows.append(load_table(spark, "documents", sf_dir).count())
        best = float("inf")
        for _ in range(2):  # min-of-2: shave one-off noise
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        secs.append(best)

    row_ratio = rows[-1] / rows[0]
    time_ratio = secs[-1] / secs[0]
    assert time_ratio <= 1.5 * row_ratio, (
        f"{name}: wall-time grew {time_ratio:.1f}x over a "
        f"{row_ratio:.0f}x row span (limit {1.5 * row_ratio:.0f}x) — "
        f"rows={rows} secs={[round(s, 2) for s in secs]}; "
        "quadratic creep suspected"
    )
    # adjacent-step sanity: the 0.01 -> 0.1 decade alone must also stay
    # sub-quadratic (a tail blowup can hide behind a cheap first decade)
    decade_rows = rows[-1] / rows[1]
    decade_time = secs[-1] / max(secs[1], 1e-9)
    assert decade_time <= 1.5 * decade_rows, (
        f"{name}: last-decade wall-time grew {decade_time:.1f}x over a "
        f"{decade_rows:.0f}x row span — rows={rows} "
        f"secs={[round(s, 2) for s in secs]}"
    )
