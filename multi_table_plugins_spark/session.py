"""SparkSession factory with scale-appropriate defaults.

Tuned for the sandbox (local[N], 128 GiB) but every knob is the one you
would set on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
splitting), shuffle partitions sized to cores, Arrow enabled for the
pandas-UDF boundary, and small broadcast threshold left at default so
Catalyst broadcasts dimension tables on its own.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "multi-table-plugins-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        # 4x cores: fine enough that hash imbalance over write combos
        # (table x bucket) doesn't leave straggler tasks; AQE coalesces
        # small partitions back together where it matters
        shuffle_partitions = max(4 * cores, 16)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT64 µs timestamps (not legacy INT96): INT96 columns carry NO
        # parquet min/max statistics, which silently disables manifest
        # file skipping for timestamp keys — and µs INT64 is what every
        # modern reader (Iceberg, DuckDB, pyarrow) expects
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # dynamic-partition writes: concurrent per-partition writers instead
        # of a per-task sort — the sort dominates when rows carry arrays
        .config("spark.sql.maxConcurrentOutputFileWriters", "640")
        # dimension tables / per-batch key sets broadcast freely on a
        # 128 GiB box (cluster guidance: size to executor memory)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
