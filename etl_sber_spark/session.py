"""SparkSession factory.

Defaults are sized for the local[32] test box but every knob is
environment-overridable so the same code runs on a real cluster:
on a 1000-executor deployment you would leave master/memory to
spark-submit and only keep the semantic configs (UTC session timezone,
AQE, Arrow) from here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "etl_sber_spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    Semantics-relevant settings:
    - ``spark.sql.session.timeZone=UTC``: parquet/duckdb comparisons are
      timezone-naive; pinning UTC makes Spark timestamps bit-identical.
    - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
      broadcast conversion — the scale path for every join/agg here.
    - Arrow on: vectorized createDataFrame / toPandas / pandas UDFs.
    """
    cpus = cpus or default_parallelism()
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # parquet writers downstream: stable timestamp physical type
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # scan granularity: size map tasks so a partition fits executor
        # memory at the target SF (SCALE.md); default 128m, env-tunable
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # the events table is written with nanosecond timestamps; read them
        # as long and convert to microsecond timestamps at scan (tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
