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
    dedup_horizon_days: int = 7,
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
    a transaction re-shipped in a later file (supplier re-sends,
    overlapping exports) lands once — the streaming analog of the
    blacklist anti-join idiom (SURVEY §2.5 J3). Implemented as an
    anti-join against the trans_ids already LOADED in the last
    ``dedup_horizon_days`` of ``load_date`` partitions (partition-
    pruned, single-column scan), plus an in-batch dropDuplicates —
    NOT as watermarked streaming-dedup state. The watermark form
    (``dropDuplicatesWithinWatermark``) drops every row older than the
    watermark as late input, so one delayed supplier FILE would vanish
    wholesale, non-duplicates included (review finding); the anti-join
    loads late data normally and only suppresses true re-ships.
    Duplicates re-shipped later than the horizon do land twice — the
    same bound the watermark had, without the data loss. Crash-replay
    stays exactly-once for rows WITH a ``trans_id``: a replayed batch's
    rows are already in the fact, so the anti-join removes them.
    NULL-``trans_id`` rows are the documented exception (r8 review
    chose pass-through over silent collapse): a NULL key matches
    neither dropDuplicates' group nor the left_anti probe, so a
    crash-replayed batch — or a re-shipped file inside the horizon —
    appends its NULL-id rows a second time. At-least-once for keyless
    rows, exactly-once for keyed ones; key hygiene (and any replay
    cleanup) stays a downstream quality gate, which is why they land in
    the fact rather than a quarantine table that loaders would forget
    to union back.

    Mode is per-directory: ``dedup_ids=False`` writes through Spark's
    transactional file sink (``_spark_metadata`` log). Readers of such
    a directory resolve files THROUGH the log, so later appends written
    by the dedup path would be invisible — do not mix modes on one
    ``out_dir``.
    """
    typed = stream_transactions(
        spark,
        inbox,
        archive_to=archive_to,
        max_files_per_trigger=max_files_per_trigger,
    )
    fact = typed.withColumn(
        "create_date", F.lit(processing_ts).cast("timestamp")
    ).withColumn("load_date", F.to_date(F.lit(processing_ts.date())))
    if not dedup_ids:
        return (
            fact.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .partitionBy("load_date")
            .trigger(availableNow=True)
            .start()
        )

    cutoff = processing_ts.date() - dt.timedelta(days=dedup_horizon_days)

    def apply_batch(batch_df, batch_id: int) -> None:
        import os as _os

        # NULL trans_ids are NOT duplicates of each other:
        # dropDuplicates uses group-by semantics where NULLs compare
        # equal, so N missing-id rows would collapse to one loaded row —
        # silent record loss the strict (dedup_ids=False) path does not
        # have. NULL keys pass through unchanged, consistent with the
        # anti-join below (a NULL key never matches left_anti) — key
        # hygiene stays a downstream quality gate, not a load-time drop
        # (r8 review).
        b = batch_df.filter(F.col("trans_id").isNull()).unionByName(
            batch_df.filter(F.col("trans_id").isNotNull()).dropDuplicates(
                ["trans_id"]
            )
        )
        entries = _os.listdir(out_dir) if _os.path.isdir(out_dir) else []
        # committed data only: a crashed write leaves _temporary, which
        # is not readable parquet
        if any(
            "=" in e or e.endswith(".parquet") or e.startswith("part-")
            for e in entries
        ):
            seen = (
                spark.read.parquet(out_dir)
                .filter(F.col("load_date") >= F.lit(cutoff))
                .select("trans_id")
            )
            b = b.join(seen, "trans_id", "left_anti")
        b.write.mode("append").partitionBy("load_date").parquet(out_dir)

    return (
        fact.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
