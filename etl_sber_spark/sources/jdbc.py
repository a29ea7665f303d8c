"""JDBC source (SURVEY.md §2.1 SRC5 — the reference reads
``bank.clients/accounts/cards`` and all ``s_20_*`` tables over Oracle
JDBC via jaydebeapi, main.py:7-11, 410-416).

In this repo the same tables are parquet fixtures (sources/tables.py);
this module is the production path: ``spark.read.jdbc`` with explicit
partitioned-read options so a big table scans in parallel instead of
through one connection. No driver jar ships here — the container has no
database — so the only test exercises the error path; the call shape is
the documented Spark API.

Scale notes baked into the signature:

- ``partition_column/lower/upper/num_partitions``: Spark issues one
  range-predicated query per partition — the difference between 1
  connection streaming 10⁹ rows and 64 parallel range scans;
- ``fetchsize``: Oracle defaults to 10 rows/roundtrip; 10⁴ is the
  sane floor for bulk reads;
- ``predicates``: alternative explicit WHERE-clause shards for
  non-numeric partition keys (e.g. hash buckets of card_num).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC table read. Exactly one of
    (partition_column + bounds + num_partitions) or ``predicates`` or
    neither (single-partition read, small tables only).

    The contract is ENFORCED: passing both sharding modes, or a
    partition column without both bounds, raises ValueError here —
    otherwise Spark would either silently ignore the partition options
    (predicates wins) or fail deep inside JDBC option parsing on the
    literal string 'None'.
    """
    if predicates is not None and partition_column is not None:
        raise ValueError(
            "pass either predicates or partition_column, not both"
        )
    if partition_column is not None and (
        lower_bound is None or upper_bound is None
    ):
        raise ValueError(
            "partition_column requires lower_bound and upper_bound"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if predicates is not None:
        # spark.read.jdbc(...) with predicates needs the non-builder API
        props = {"fetchsize": str(fetchsize)}
        if user is not None:
            props["user"] = user
        if password is not None:
            props["password"] = password
        if driver is not None:
            props["driver"] = driver
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 16))
        )
    return reader.load()
