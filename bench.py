"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + materialize counts via a
cheap action). A warm-up pass on sf-independent metadata (session boot,
JIT) is excluded from per-query timings by timing only after the session
is live.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_examples_spark.queries import registry
from flink_examples_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # warm the Python/Arrow worker pool so the alphabetically-first
    # pandas-UDF query isn't billed for executor-python startup
    spark.range(spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # min-of-N repetitions: this box shows ±20% run-to-run noise on a
    # few queries, so a single rep can't distinguish a real regression
    # from jitter; the min is the stable "how fast can this plan go".
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name, q in sorted(registry().items()):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            # force full materialization (not just count pushdown)
            n = df.collect()
            elapsed = round(time.perf_counter() - t0, 4)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            del n

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
