"""Task-count repair for compute-bound stages over small scans.

Parquet split planning tracks BYTES (``spark.sql.files.maxPartitionBytes``),
but the token-hash operators (dedup/similarity/fingerprinting) do work
proportional to rows × tokens: a sub-megabyte single-row-group
``documents`` file plans as ONE input split, and a row group is the
smallest readable unit — no bytes-based config can split it further. The
whole md5/codegen stage then runs on one core while the rest of the
executor idles; at sf0.1 that single task dominated q_doc_overlap,
q_minhash_signatures, and q_simhash wall-clock.

``spread`` round-robin-repartitions such an input up to the session's
default parallelism. The shuffle it introduces moves only the raw
column data — tiny by construction, that is exactly why the scan planned
as one split — and unlocks the dominant compute stage. On warehouse-scale
inputs (thousands of splits) the guard makes it a no-op, so the 100 TB
plan carries no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_parallelism`` (default: the session's
    ``defaultParallelism``) if and only if its current plan yields fewer
    partitions — cheap CPU-stage fan-out for small hot inputs, no-op on
    inputs that already parallelize."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
