"""Iterative computation (SURVEY.md §2.11 M2).

The reference's IterateExample.java:56-108 builds a streaming feedback
edge (Fibonacci steps until value >= 100, emitting iteration counts).
Spark has no streaming feedback loop. Two batch formulations:

- ``fib_steps`` (default): the per-row iteration is independent across
  rows, so it belongs *inside* the row pipeline — one ``mapInPandas``
  pass runs the whole fixed-point per Arrow batch with vectorized numpy
  column ops (no shuffle, no driver round-trips, scales linearly with
  partitions — the 100 TB-safe formulation).
- ``fib_steps_driver_loop``: the faithful feedback-edge emulation — a
  driver-controlled loop where every step is a distributed transform and
  finished rows retire from the working set. Use when the step function
  genuinely needs cross-row operations (joins/aggregations per
  iteration); ``localCheckpoint`` truncates lineage each round.

Documented divergence: both are batch-only (SURVEY.md §7.4.6).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fib_steps(pairs: DataFrame, x_col: str, y_col: str, limit: int = 100,
              max_iter: int = 64) -> DataFrame:
    """For each (x, y) row: apply (x, y) -> (y, x+y) until y >= limit;
    return the original columns plus ``n_steps`` (IterateExample.java:
    114-187 semantics).

    Vectorized: each Arrow batch iterates all its rows together on numpy
    arrays; rows that reached ``limit`` freeze. Fibonacci growth bounds
    the loop at ~O(log_phi(limit)) passes per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf[x_col].to_numpy(dtype=np.int64).copy()
            y = pdf[y_col].to_numpy(dtype=np.int64).copy()
            steps = np.zeros(len(pdf), dtype=np.int64)
            for _ in range(max_iter):
                active = y < limit
                if not active.any():
                    break
                nx = y[active]
                y[active] = x[active] + y[active]
                x[active] = nx
                steps[active] += 1
            yield pd.DataFrame({
                "x0": pdf[x_col].to_numpy(dtype=np.int64),
                "y0": pdf[y_col].to_numpy(dtype=np.int64),
                "n_steps": steps,
            })

    return pairs.select(x_col, y_col).mapInPandas(
        run, "x0 long, y0 long, n_steps long"
    )


def fib_steps_driver_loop(pairs: DataFrame, x_col: str, y_col: str,
                          limit: int = 100, max_iter: int = 64) -> DataFrame:
    """Feedback-edge emulation: driver-side fixed-point loop over
    DataFrames (each step a distributed transform; finished rows retire).
    Prefer ``fib_steps`` unless each step needs cross-row operators.
    """
    work = pairs.select(
        F.col(x_col).alias("x0"),
        F.col(y_col).alias("y0"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.lit(0).alias("n_steps"),
    )
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    done_parts: list[DataFrame] = []
    for _ in range(max_iter):
        work = work.localCheckpoint(eager=True)  # truncate lineage per round
        done_parts.append(work.filter(F.col("y") >= limit))
        work = work.filter(F.col("y") < limit)
        if work.limit(1).count() == 0:
            break
        work = work.select(
            "x0",
            "y0",
            F.col("y").alias("x"),
            (F.col("x") + F.col("y")).alias("y"),
            (F.col("n_steps") + 1).alias("n_steps"),
        )
    # rows still below limit after max_iter rounds retire with the
    # iteration cap as their step count — fib_steps' contract; dropping
    # them would silently shrink the output
    done_parts.append(work)
    result = done_parts[0]
    for part in done_parts[1:]:
        result = result.unionByName(part)
    return result.select("x0", "y0", "n_steps")
