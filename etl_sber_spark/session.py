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
        # AQE coalescing target: partitions aim at ~64 MB post-shuffle
        # (default stated for clarity; raise on a real cluster with
        # fast networks — guide §2.2's 100 MB-1 GB band)
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"),
        )
        # the events table is written with nanosecond timestamps; read them
        # as long and convert to microsecond timestamps at scan (tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Scale-adaptive shuffle sizing (r11, guide §2.2/§2.5): when the
    # expected shuffle volume dwarfs the core count, a per-core
    # shuffle.partitions default leaves every reducer with GBs of
    # state — the 1000× curate profile measured 3.7-7.5 GB of disk
    # spill PER JOIN STAGE at 32 partitions, with AQE's skew splitter
    # silent because uniformly-oversized partitions are not "skewed"
    # (max ≈ median). Setting AQE's initialPartitionNum high starts
    # every shuffle wide and lets coalescing shrink small ones back to
    # ~advisory size, so the SAME code serves both regimes: unset (the
    # default) keeps the bench's per-core layout; the scale tools set
    # it from their input size (tools/scale_smoke_corpus_e2e.py). On a
    # real cluster this is the standing recommendation over a global
    # shuffle.partitions constant.
    init_parts = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    if init_parts:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            init_parts,
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
