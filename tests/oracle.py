"""Dual-run oracle harness — mimics the driver's CORRECTNESS check.

Runs a registry query through Spark and its oracle SQL through DuckDB on
the same parquet tables, then compares row count, column-name set, and
order-insensitive values (sorted by all columns). Floats compare with a
tiny relative tolerance AND are also checked for exact string equality so
any bit-level divergence is surfaced early (the driver hash-compares).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from flink_examples_spark.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    row_match: bool
    schema_match: bool
    values_match: bool
    exact_hash_match: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = 0
    mismatches: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.row_match and self.schema_match and self.values_match


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if pd.isna(a) and pd.isna(b):
            return True
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b or (pd.isna(a) and pd.isna(b))


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_pd = spark_df.toPandas()
    con = duck_con(sf_dir)
    oracle_pd = con.sql(oracle_sql).df()
    con.close()

    res = CompareResult(
        name,
        row_match=len(spark_pd) == len(oracle_pd),
        schema_match=sorted(spark_pd.columns) == sorted(oracle_pd.columns),
        values_match=False,
        exact_hash_match=False,
        spark_rows=len(spark_pd),
        oracle_rows=len(oracle_pd),
    )
    if not res.row_match or not res.schema_match:
        res.detail = (
            f"rows spark={len(spark_pd)} oracle={len(oracle_pd)}; "
            f"cols spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}"
        )
        return res

    s = _canon(spark_pd)
    o = _canon(oracle_pd)
    mism = []
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _cell_eq(a, b):
                mism.append((c, i, a, b))
                if len(mism) > 5:
                    break
        if len(mism) > 5:
            break
    res.values_match = not mism
    res.mismatches = mism

    # strict: would a hash of stringified values match?
    s_str = s.astype(str)
    o_str = o.astype(str)
    res.exact_hash_match = s_str.equals(o_str)
    if mism:
        res.detail = f"value mismatches (col,row,spark,oracle): {mism[:5]}"
    elif not res.exact_hash_match:
        diff_cols = [c for c in s.columns if not s_str[c].equals(o_str[c])]
        ex = ""
        for c in diff_cols[:1]:
            neq = s_str[c] != o_str[c]
            idx = neq[neq].index[:3].tolist()
            ex = f" e.g. {c}: " + "; ".join(
                f"[{i}] {s_str[c][i]!r} vs {o_str[c][i]!r}" for i in idx
            )
        res.detail = f"values close but not string-identical in cols {diff_cols}{ex}"
    return res
