"""Streaming inbox: the reference's cron micro-batch as a Structured
Streaming file source (SURVEY.md §2.9).

The reference polls a directory every night (main.cron:1), loads each
matching file, and renames it to Archive/ for exactly-once semantics
(main.py:535-572). The streaming rebuild keeps the same contract with
Spark's own machinery:

- file source + ``Trigger.AvailableNow``: drain everything currently in
  the inbox, then stop — the cron-batch semantics, but restart-safe;
- checkpoint: exactly-once per FILE without the rename protocol — a
  restart never re-ingests a processed file;
- ``cleanSource=archive``: Spark itself moves consumed files aside
  (the Archive/ move, minus the race conditions).

Continuous mode is the same call with a processing-time trigger — the
inbox then behaves as a live landing zone. Only the transactions feed
streams: dimension snapshots (terminals/blacklist) are whole-file
replace/cumulative semantics, which are batch by nature (and xlsx).

Scale: the file source lists the inbox per micro-batch (set
``maxFilesPerTrigger`` to bound batch size); parsing/normalization is
the SAME codegen projection as the batch reader (sources/io.py) — one
code path, two triggers.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .. import schemas
from ..sources.io import normalize_transactions


def stream_transactions(
    spark: SparkSession,
    inbox: str,
    *,
    max_files_per_trigger: int | None = None,
    archive_to: str | None = None,
) -> DataFrame:
    """Unbounded typed transactions DataFrame from a CSV inbox."""
    reader = (
        spark.readStream.option("sep", ";")
        .option("header", True)
        .schema(schemas.TRANSACTIONS_RAW)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if archive_to:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_to
        )
    raw = reader.csv(inbox)
    return normalize_transactions(raw)


def load_transactions_available_now(
    spark: SparkSession,
    inbox: str,
    out_dir: str,
    checkpoint_dir: str,
    processing_ts: dt.datetime,
    *,
    dedup_ids: bool = False,
    watermark: str = "1 day",
    archive_to: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Drain the inbox into the partitioned fact directory, then stop.

    ``archive_to`` enables the module-contract ``cleanSource=archive``
    move (the reference's Archive/ protocol): without it, consumed
    files sit in the inbox forever and every nightly run re-LISTS an
    ever-growing directory (the checkpoint prevents re-ingest, not
    listing cost). ``max_files_per_trigger`` bounds micro-batch size
    during backlog catch-up.

    One invocation == one reference cron run (files present at trigger
    time are loaded exactly once; already-checkpointed files are
    skipped). The fact layout matches the batch path: ``create_date``
    stamp + ``load_date`` partition (pipeline.py).

    ``dedup_ids=True`` additionally enforces RECORD-level exactly-once:
    ``dropDuplicatesWithinWatermark`` on trans_id, so a transaction
    re-shipped in a later file (supplier re-sends, overlapping exports)
    lands once — the streaming analog of the blacklist anti-join idiom
    (SURVEY §2.5 J3). Plain ``dropDuplicates(['trans_id'])`` would NOT
    bound state here: Spark only evicts dropDuplicates state when the
    event-time column is part of the dedup keys, so id-only dedup state
    grows with lifetime distinct ids. The WithinWatermark variant
    (Spark 3.5+) evicts each id once it is older than the watermark
    horizon, trading the unbounded guarantee for "no duplicate arrives
    more than ``watermark`` late" — exactly the re-shipped-file window.
    """
    typed = stream_transactions(
        spark,
        inbox,
        archive_to=archive_to,
        max_files_per_trigger=max_files_per_trigger,
    )
    if dedup_ids:
        typed = typed.withWatermark(
            "trans_date", watermark
        ).dropDuplicatesWithinWatermark(["trans_id"])
    fact = typed.withColumn(
        "create_date", F.lit(processing_ts).cast("timestamp")
    ).withColumn("load_date", F.to_date(F.lit(processing_ts.date())))
    return (
        fact.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("load_date")
        .trigger(availableNow=True)
        .start()
    )
