"""Iterative computation as a driver-side loop (SURVEY.md §2.11 M2).

The reference's IterateExample.java:56-108 builds a streaming feedback
edge (Fibonacci steps until value >= 100, emitting iteration counts).
Spark has no streaming feedback loop; the faithful batch equivalent is a
driver-controlled fixed-point loop over DataFrames — each step is a full
distributed transform, convergence is checked with a cheap aggregate,
and finished rows are retired from the working set so per-iteration work
shrinks. Documented divergence: this is batch-only (SURVEY.md §7.4.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fib_steps(pairs: DataFrame, x_col: str, y_col: str, limit: int = 100,
              max_iter: int = 64) -> DataFrame:
    """For each (x, y) row: apply (x, y) -> (y, x+y) until y >= limit;
    return the original columns plus ``n_steps`` (IterateExample.java:
    114-187 semantics, keyed by the input row id columns).

    The loop runs on the driver but every step is a distributed
    projection; finished rows exit the loop early. Iteration count is
    bounded by ``max_iter`` as a safety valve (Fibonacci reaches any
    limit quickly).
    """
    work = pairs.select(
        F.col(x_col).alias("x0"),
        F.col(y_col).alias("y0"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
        F.lit(0).alias("n_steps"),
    )
    done_parts: list[DataFrame] = []
    for _ in range(max_iter):
        done = work.filter(F.col("y") >= limit)
        if done.limit(1).count() > 0:
            done_parts.append(done)
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
    result = done_parts[0]
    for part in done_parts[1:]:
        result = result.unionByName(part)
    return result.select("x0", "y0", "n_steps")
