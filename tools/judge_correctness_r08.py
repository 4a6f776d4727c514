"""Judge re-run of the identical dual-run check over EVERY registry entry.

Same logic as tools/gen_correctness.py but writes CORRECTNESS_judge_r08.json.
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

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
    out = {}
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
        except Exception as e:  # noqa: BLE001
            row = {"err": f"{type(e).__name__}: {e}"[:500]}
            ok = False
        if not ok:
            n_fail += 1
        out[name] = row
        print(("OK  " if ok else "FAIL") + f" {name}", flush=True)

    path = os.path.join(ROOT, "CORRECTNESS_judge_r08.json")
    with open(path, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "n_queries": len(out),
                "n_oracle": sum(1 for v in out.values() if "hash_match" in v),
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
