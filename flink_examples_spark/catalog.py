"""Loaders for the driver's synthetic TPC-H-ish parquet tables.

See /root/repo/TESTDATA.md. The reference derives schemas from Java POJOs
via reflection (e.g. topn/HotItems.java:49-53 TypeExtractor); here the
schema authority is the parquet footer — Spark reads it directly, no
registry needed, and Catalyst prunes columns/pushes filters into the scan.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet timestamp[ns] (Spark can't read those natively)."""
    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one synthetic table as a DataFrame (parquet scan, lazy).

    Timestamp normalization (the schema authority is whatever the driver
    wrote, which has changed across rounds):

    - nanosecond columns: Spark can't read timestamp[ns] natively, so
      they're read as raw longs (``nanosAsLong``) and truncated to
      micros — the same ns→us truncation DuckDB applies;
    - microsecond columns without the UTC-adjustment flag: Spark 4
      infers these as TIMESTAMP_NTZ, which breaks epoch arithmetic
      (``unix_micros`` et al.) and diverges from the LTZ type every
      operator was built against. Cast back to session-zoned TIMESTAMP
      (sessions here run UTC, so values are identical to DuckDB's naive
      reading either way).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views so Spark SQL can address them."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
