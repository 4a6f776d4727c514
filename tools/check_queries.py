"""Spot-check a subset of registry queries against their DuckDB oracles.

The optimization rounds change PLANS, never RESULTS — after touching a
query, run it (and anything sharing the changed operator) through the
same dual-run compare the driver uses, at one or more scale factors:

  python tools/check_queries.py --names a,b,c [--sf 0.01,0.001]

Queries without an oracle run rows-only (materialize + count). Exit
code 1 on any mismatch or error.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default="0.01")
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    sfs = [s.strip() for s in args.sf.split(",") if s.strip()]

    from flink_examples_spark.queries import registry
    from flink_examples_spark.session import get_spark
    from tests.oracle import compare

    spark = get_spark("check")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in names:
            q = reg[name]
            try:
                df = q.spark_fn(spark, sf_dir)
                if q.oracle is None:
                    n = df.count()
                    print(f"sf{sf} {name}: rows_only n={n}")
                    continue
                res = compare(name, df, q.oracle, sf_dir)
                status = "OK " if (res.ok and res.exact_hash_match) else "FAIL"
                if status == "FAIL":
                    bad += 1
                print(
                    f"sf{sf} {name}: {status} rows={res.spark_rows}/"
                    f"{res.oracle_rows} hash={res.exact_hash_match} "
                    f"{res.detail or ''} {res.mismatches[:3] or ''}"
                )
            except Exception as e:
                bad += 1
                print(f"sf{sf} {name}: ERROR {type(e).__name__}: {e}")
        # session hygiene between scale factors
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist()
        except Exception:
            pass
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
