"""flink_examples_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
``BitterGourd/flink-examples`` (a Flink DataStream demo collection) as an
idiomatic Spark DataFrame / Spark SQL / Structured Streaming library.

Layout:
  session    — tuned SparkSession factory (AQE, UTC, Arrow)
  catalog    — loaders for the driver's TPC-H-ish parquet tables
  operators/ — windows, joins, top-N, CEP/MATCH_RECOGNIZE, dedup,
               similarity search, stateful ops, iteration
  functions/ — scalar/text/vector column expression helpers
  sources/   — batch + streaming readers (file, rate, kafka, binary codecs)
  streaming/ — watermarks, stateful streaming ops, foreachBatch sinks
  plans/     — explain/plan-inspection utilities
"""

from flink_examples_spark.session import get_spark
from flink_examples_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
__version__ = "0.1.0"
