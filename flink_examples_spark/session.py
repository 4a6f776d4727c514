"""SparkSession factory with scale-oriented defaults.

The reference configures its environment per job (parallelism, state
backend, checkpointing — e.g. Checkpointing.java:28-67,
StateMachineExample.java:92-104). Here the equivalent engine-level knobs
are centralized: AQE for runtime re-planning (skew joins, partition
coalescing), UTC session time so event-time windows are epoch-aligned and
reproducible, Arrow for every pandas-UDF boundary, and a shuffle
partition count sized to the local core count (on a real cluster this is
overridden to ~2-3x total cores; AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink-examples-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``extra_conf`` doubles as the global-job-parameter channel (M4/S11,
    TransferGlobalParam.java:11-37 / WordCount.java:24-29): values set
    here are visible to every operator via ``spark.conf.get`` — the
    ``GlobalJobParameters`` equivalent; closure captures and broadcast
    variables cover per-operator constants.

    Honors ``SPARK_GRAFT_CPUS`` for local core count. All settings are
    chosen to survive a 100 TB / 1000-executor scale-up: AQE handles
    skew + partition sizing at runtime, broadcast threshold lets small
    dimension tables avoid shuffles, and RocksDB-ready streaming state
    config is applied when streaming ops are used.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- deterministic, reproducible semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: runtime re-planning at scale ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- broadcast joins for dimension tables (BroadcastDimension.java:100) ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for all pandas-UDF boundaries (vectorized, not per-row) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: keep file-split partitions memory-friendly ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def streaming_conf(rocksdb: bool = True) -> dict[str, str]:
    """Config fragment for stateful streaming queries.

    Mirrors the reference's state-backend selection
    (StateMachineExample.java:95-104 memory/fs/rocksdb): RocksDB state
    store provider is the scale path — state spills to local disk rather
    than executor heap, matching the reference's RocksDB incremental
    checkpointing intent.
    """
    conf = {
        "spark.sql.streaming.stateStore.stateSchemaCheck": "true",
    }
    if rocksdb:
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
        conf["spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"] = "true"
    return conf
