"""Per-query profiler for the optimization rounds.

For each named query (default: all, or a comma list / top-N by the
latest committed fold), this tool:

  - captures ``df.explain("formatted")`` to plans/r{ROUND}/<name>_<tag>.txt
  - times ``reps`` collect() repetitions (same action as bench.py)
  - counts Spark jobs, stages and tasks the query submitted (via a
    per-query job group + StatusTracker) — the "how many barriers does
    this plan pay" number that explain() alone doesn't show
  - counts plan nodes of interest (Exchange / BatchEvalPython /
    ArrowEvalPython / SortMergeJoin / CartesianProduct)

Usage:
  python tools/profile_queries.py --names a,b,c --tag before
  python tools/profile_queries.py --top 40 --tag before
  SPARK_GRAFT_SF_DIR=... to override the data dir.

Output: one JSON line per query on stdout; plans under plans/r{N}/.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def current_round() -> int:
    best = 0
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def top_by_fold(n: int) -> list[str]:
    rnd = current_round()
    for r in (rnd, rnd - 1):
        path = os.path.join(ROOT, f"BENCH_local_r{r:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
            steady = doc.get("steady") or doc.get("queries") or {}
            return [
                k for k, _ in sorted(
                    steady.items(), key=lambda kv: -kv[1]
                )[:n]
            ]
    return []


def plan_counts(plan: str) -> dict[str, int]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
        "scans": len(re.findall(r"Scan parquet|FileScan", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "aqe": len(re.findall(r"AdaptiveSparkPlan", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = current_round()
    plans_dir = os.path.join(ROOT, "plans", f"r{rnd}")
    os.makedirs(plans_dir, exist_ok=True)

    from flink_examples_spark.queries import registry
    from flink_examples_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warm-ups as bench.py so timings are comparable
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(sc.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()
    from pyspark.sql import functions as F

    r = spark.range(64)
    r.select(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(63)),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ).alias("s")
    ).count()
    r.join(F.broadcast(spark.range(8)), "id", "left").count()

    reg = registry()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    elif args.top:
        names = [n for n in top_by_fold(args.top) if n in reg]
    else:
        names = sorted(reg)

    tracker = sc.statusTracker()
    for name in names:
        q = reg[name]
        ts = []
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        jobs_before = set(tracker.getJobIdsForGroup(group))
        df = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.collect()
            ts.append(round(time.perf_counter() - t0, 3))
        jobs = [
            j for j in tracker.getJobIdsForGroup(group)
            if j not in jobs_before
        ]
        # stage ids dedupe across jobs/attempts (ADVICE r13: the old
        # always-true task-count guard was vacuous and retried stages
        # were double-counted, inflating stages/tasks per rep)
        n_stages = n_tasks = 0
        seen_stages: set[int] = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                if sid in seen_stages:
                    continue
                seen_stages.add(sid)
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        sc.setJobGroup("idle", "idle")
        try:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        if not args.no_plans:
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(plan)
        rec = {
            "name": name,
            "reps": ts,
            "steady": min(ts[1:]) if len(ts) > 1 else ts[0],
            "jobs_per_rep": round(len(jobs) / args.reps, 1),
            "stages_per_rep": round(n_stages / args.reps, 1),
            "tasks_per_rep": round(n_tasks / args.reps, 1),
            **plan_counts(plan),
        }
        print(json.dumps(rec), flush=True)
        # session hygiene, same as bench.py
        try:
            for jrdd in sc._jsc.getPersistentRDDs().values():
                jrdd.unpersist()
        except Exception:
            pass

    spark.stop()


if __name__ == "__main__":
    main()
