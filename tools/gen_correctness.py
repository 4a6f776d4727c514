"""Generate the all-registry correctness artifact the driver can't.

The round driver's CORRECTNESS sweep caps at 50 queries, so most of the
registry carries no driver-signed row (VERDICT r3 'What's wrong #3').
This tool runs the IDENTICAL dual-run check (tests/oracle.compare —
Spark vs DuckDB on the same parquet, row count + column set +
order-insensitive values + exact hash) over EVERY registry entry at
sf0.01 and writes CORRECTNESS_local_r{N}.json in the driver's row shape
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err});
queries without an oracle get the driver's weaker rows-only shape
({rows_only: true, spark_rows, err}). Committed per round so the judge
can diff instead of re-running.

Fresh-session rotation (VERDICT r6 #5): the main sweep runs one warm
session, which can hide load-time conf dependencies (a query that only
works because an earlier query set a conf). Each round a DETERMINISTIC
50-query window of the sorted registry — rotated by round number, so
every query is periodically covered — re-runs in a BRAND-NEW subprocess
(fresh JVM, fresh SparkSession, plain driver-style conf). Results land
in the artifact under "fresh_session".

Run: python tools/gen_correctness.py   [SPARK_GRAFT_SF_DIR to override]

Flags (VERDICT r8 #4 — one harness for builder AND judge, no per-round
copies):
  --out PATH    write the artifact to PATH instead of
                CORRECTNESS_local_r{N}.json (the judge passes
                CORRECTNESS_judge_r{N}.json and runs the exact builder
                harness)
  --no-fresh    skip the fresh-session rotation subprocess (the judge's
                single-session sweep)
  --round N     override the round number used for output naming and
                the rotation window (default: newest driver round + 1)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FRESH_SUBSET_SIZE = 50


def current_round() -> int:
    best = 0
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def _make_spark():
    from pyspark.sql import SparkSession

    # plain session, like the driver (catches load-time conf we forgot)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(
    spark, names, qs, osql, sf_dir
) -> tuple[dict[str, dict], int]:
    from tests.oracle import compare

    out: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        fn = qs[name]
        try:
            if name in osql:
                r = compare(name, fn(spark, sf_dir), osql[name], sf_dir)
                row = {
                    "rows_match": r.row_match,
                    "schema_match": r.schema_match,
                    "hash_match": r.exact_hash_match,
                    "spark_rows": r.spark_rows,
                    "oracle_rows": r.oracle_rows,
                    "err": None,
                }
                ok = r.ok and r.exact_hash_match
            else:
                c = fn(spark, sf_dir).count()
                row = {"rows_only": True, "spark_rows": c, "err": None}
                ok = c >= 0
        except Exception as e:
            row = {"err": f"{type(e).__name__}: {e}"[:500]}
            ok = False
        row["ok"] = ok  # the single decision point; failing_names reads it
        if not ok:
            n_fail += 1
        out[name] = row
        print(("OK  " if ok else "FAIL") + f" {name}", flush=True)
    return out, n_fail


def failing_names(rows: dict[str, dict]) -> set[str]:
    """Names whose row records a failure. Reads the persisted per-row
    `ok` bit (the one decision point, ADVICE r8); rows from pre-r9
    artifacts without it fall back to re-deriving the same predicate."""
    bad = set()
    for name, row in rows.items():
        if "ok" in row:
            if not row["ok"]:
                bad.add(name)
        elif row.get("err") is not None:
            bad.add(name)
        elif not row.get("rows_only") and not (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        ):
            bad.add(name)
    return bad


def rotated_subset(names: list[str], n_round: int,
                   size: int = FRESH_SUBSET_SIZE) -> list[str]:
    """Deterministic round-rotated window of the sorted registry: round
    N covers names[(N-1)*size % len :][:size] (wrapping), so every
    query gets a fresh-session re-check every ceil(len/size) rounds."""
    if len(names) <= size:
        return list(names)
    off = ((n_round - 1) * size) % len(names)
    return [names[(off + i) % len(names)] for i in range(size)]


def _fresh_subset_main() -> None:
    """Subprocess entry: brand-new JVM + SparkSession, run the listed
    queries, write rows JSON to $SPARK_GRAFT_FRESH_OUT."""
    names = [
        n for n in os.environ["SPARK_GRAFT_FRESH_SUBSET"].split(",") if n
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = _make_spark()
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    out, n_fail = run_queries(spark, names, qs, osql, sf_dir)
    with open(os.environ["SPARK_GRAFT_FRESH_OUT"], "w") as f:
        json.dump({"rows": out, "n_fail": n_fail}, f)
    spark.stop()
    sys.exit(0)


def main() -> None:
    if os.environ.get("SPARK_GRAFT_FRESH_SUBSET"):
        _fresh_subset_main()
        return
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--out", default=None,
                    help="artifact path (default CORRECTNESS_local_r{N}.json)")
    ap.add_argument("--no-fresh", action="store_true",
                    help="skip the fresh-session rotation subprocess")
    ap.add_argument("--round", type=int, default=None,
                    help="round number override for naming + rotation")
    args = ap.parse_args()
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = _make_spark()

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    names = sorted(qs.keys())
    out, n_fail = run_queries(spark, names, qs, osql, sf_dir)
    n = args.round if args.round is not None else current_round()

    # fresh-session rotation: re-check this round's window in a new
    # process so load-order/warm-session conf dependencies can't hide
    fresh: dict | None = None
    if args.no_fresh:
        n_fail = len(failing_names(out))
    else:
        subset = rotated_subset(names, n)
        fresh_out = os.path.join(ROOT, ".fresh_subset_tmp.json")
        fresh = {"names": subset, "err": None}
        try:
            env = dict(
                os.environ,
                SPARK_GRAFT_FRESH_SUBSET=",".join(subset),
                SPARK_GRAFT_FRESH_OUT=fresh_out,
                SPARK_GRAFT_SF_DIR=sf_dir,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, cwd=ROOT, timeout=1800,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            )
            with open(fresh_out) as f:
                res = json.load(f)
            fresh["rows"] = res["rows"]
            fresh["n_fail"] = res["n_fail"]
            # headline = |union of failing names| across both runs — a
            # query failing in BOTH is one failure, not two (ADVICE r7)
            n_fail = len(failing_names(out) | failing_names(res["rows"]))
            print(
                f"fresh-session subset ({len(subset)} queries, rotation "
                f"round {n}): {res['n_fail']} failures",
                flush=True,
            )
            del proc
        except Exception as e:  # missing output == the subprocess died
            fresh["err"] = f"{type(e).__name__}: {e}"[:500]
            fresh["n_fail"] = len(subset)
            n_fail = len(failing_names(out) | set(subset))
            print(f"fresh-session subset FAILED to run: {fresh['err']}")
        finally:
            try:
                os.remove(fresh_out)
            except OSError:
                pass

    path = args.out or os.path.join(ROOT, f"CORRECTNESS_local_r{n:02d}.json")
    doc = {
        "sf_dir": sf_dir,
        "n_queries": len(out),
        "n_oracle": sum(1 for v in out.values() if "hash_match" in v),
        "n_fail": n_fail,
    }
    if fresh is not None:
        doc["fresh_session"] = fresh
    doc["rows"] = out  # the big dict last, headline stays readable
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {path}: {len(out)} queries, {n_fail} failures")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
