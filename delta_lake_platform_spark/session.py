"""SparkSession factory.

The reference runs on the ambient Databricks ``spark`` global
(scd_handler.py:1,71,77). Here the session is explicit and injectable,
configured for the local[N] test harness but with settings chosen for
the 1000-executor / 100 TB design point:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — the single most important knob at scale.
- Arrow on — every pandas_udf / mapInPandas exchange is vectorized.
- shuffle partitions sized by env (local tests: #cores; a real cluster
  would use ~2-3x total executor cores or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "delta_lake_platform_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Modern timestamp encoding (Delta/Iceberg write the same):
        # INT96 — Spark's legacy default — carries NO parquet min/max
        # stats, so every timestamp column was invisible to footer-
        # stats data skipping and to log-recorded column_max lookups
        # (the streaming decayed fold reads its state anchor from
        # them). TIMESTAMP_MICROS restores both at identical values.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
