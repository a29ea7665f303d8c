"""Parquet table catalog for the driver-generated test data.

Maps to reference SRC6 (table scans — every ``FROM s_20_*`` /
``bank.*`` site, e.g. /root/reference/main.py:410-416): in the rebuild a
"table" is a parquet directory/file; Catalyst gives predicate pushdown,
column pruning and partition pruning on these scans for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table, normalizing physical-type quirks.

    The driver has shipped two physical encodings of timestamps across
    rounds, so the scan tolerates both:

    - INT64(TIMESTAMP(NANOS)), which Spark's reader rejects by default;
      sessions from session.py set ``spark.sql.legacy.parquet.nanosAsLong``
      up front, but the driver brings its own session — set the flag here
      only if it isn't already (no redundant mutation of shared session
      state on every call).
    - TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4 infers
      as TIMESTAMP_NTZ. The whole engine (SCD sentinels, to_timestamp
      results, band-join unix_micros keys) speaks TIMESTAMP, and mixing
      the two types fails analysis (unions, comparisons), so NTZ columns
      are cast to TIMESTAMP at the scan. Under the UTC session timezone
      (session.py) the cast is wall-clock- and epoch-identity.

    Both conversions are codegen'd projections: no UDF, no driver
    round-trip, so they cost nothing at 100 TB scan scale.
    """
    _FLAG = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(_FLAG, None) != "true":
        spark.conf.set(_FLAG, "true")
    path = f"{sf_dir}/{name}.parquet"
    # scale-adaptive AQE width (session.maybe_widen_partitions): raises
    # initialPartitionNum when THIS scan is large enough that the
    # session's per-core shuffle default would leave reducers with GBs
    # of state; a provable no-op at every bench SF (largest sf0.1 table
    # ~11 MB → below the core-count floor)
    from ..session import maybe_widen_partitions

    maybe_widen_partitions(spark, path)
    df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: epoch-nanos overflow double's mantissa, so
        # `/ 1000` would round the microseconds up
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns(
            {c: F.col(c).cast(T.TimestampType()) for c in ntz}
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
) -> dict[str, DataFrame]:
    """Register tables as temp views (mirrors the DuckDB oracle's
    pre-registered views) so plans can be written in Spark SQL too.

    ``names`` restricts registration to the tables a query actually
    reads: each registration is a parquet-footer schema inference
    (~60 ms), so registering all 10 per query call charged ~0.6 s of
    pure catalog setup to any SQL-shaped plan (r5 bench finding)."""
    dfs = {n: load_table(spark, sf_dir, n) for n in names}
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
