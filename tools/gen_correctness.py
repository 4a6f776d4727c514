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

Run: python tools/gen_correctness.py   [SPARK_GRAFT_SF_DIR to override]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def current_round() -> int:
    best = 0
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
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

    import __spark_entry__ as E
    from tests.oracle import compare

    qs, osql = E.queries(), E.oracle_sql()
    out: dict[str, dict] = {}
    n_fail = 0
    for name, fn in sorted(qs.items()):
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
        if not ok:
            n_fail += 1
        out[name] = row
        print(("OK  " if ok else "FAIL") + f" {name}", flush=True)

    n = current_round()
    path = os.path.join(ROOT, f"CORRECTNESS_local_r{n:02d}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "n_queries": len(out),
                "n_oracle": sum(1 for v in out.values()
                                if "hash_match" in v),
                "n_fail": n_fail,
                "rows": out,
            },
            f,
            indent=1,
        )
        f.write("\n")
    print(f"wrote {path}: {len(out)} queries, {n_fail} failures")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
