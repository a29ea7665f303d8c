"""Continuous SCD2 maintenance: snapshot files → versioned history.

The reference maintains its terminal dimension nightly — cron wakes up,
finds a full-replace snapshot file, and runs the diff/close-out/append
dance (main.py:556-565). This module is the same contract as a live
pipeline: a landing zone watched by a Structured Streaming file source,
each arriving snapshot applied to the SCD2 history through
``foreachBatch`` → :func:`~..operators.scd.scd2_apply` → atomic
versioned swap.

Why ``foreachBatch`` and not a stateful streaming operator: SCD2's
output is a *table rewrite* (close old versions, append new ones), not
an append-only stream — the natural unit is "apply one whole snapshot",
which is exactly a micro-batch. The stream machinery contributes the
things cron cannot: checkpointed exactly-once per file (a restart never
re-ingests), ordered draining of a backlog, and a processing-time
trigger turns the same code into a live continuous pipeline.

Restart safety is two-layered: the checkpoint skips consumed files, and
if a crash lands between the swap and the checkpoint commit the batch
REPLAYS — which is harmless, because re-applying an identical snapshot
at the same timestamp is a no-op on the history (the replay-no-op
invariant pinned by the hypothesis property suite,
tests/test_scd_properties.py). Exactly-once EFFECT via idempotency, the
standard foreachBatch discipline.

Scale: each micro-batch does dimension-sized work (three key joins +
union — operators/scd.py); the only driver-side data is the list of
distinct snapshot timestamps inside one batch (≈ number of backlogged
days — metadata-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd import scd2_apply
from ..sinks.warehouse import Warehouse

#: SCD2 bookkeeping columns appended to the snapshot's business columns.
HIST_COLS = (
    ("deleted_flg", T.IntegerType()),
    ("effective_from", T.TimestampType()),
    ("effective_to", T.TimestampType()),
)


def empty_history(
    spark: SparkSession, snapshot_schema: T.StructType, key: str, attrs: list[str]
) -> DataFrame:
    """The day-0 history: snapshot business columns + SCD2 bookkeeping."""
    fields = [f for f in snapshot_schema.fields if f.name in {key, *attrs}]
    hist = T.StructType(
        fields + [T.StructField(n, t, True) for n, t in HIST_COLS]
    )
    return spark.createDataFrame([], hist)


def stream_scd2_snapshots(
    spark: SparkSession,
    inbox: str,
    wh: Warehouse,
    table: str,
    key: str,
    attrs: list[str],
    snapshot_schema: T.StructType,
    checkpoint_dir: str,
    *,
    snapshot_ts_col: str = "snapshot_ts",
    max_files_per_trigger: int = 1,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Maintain ``table`` as SCD2 from full-snapshot CSV files.

    Each file is one complete dimension snapshot carrying its own
    ``snapshot_ts_col`` (the determinism contract: processing time comes
    from the DATA, never the wall clock — SURVEY §3.4). Default trigger
    is ``availableNow`` (drain the backlog in file order, then stop —
    one cron run); pass ``processing_time`` to run continuously.

    If a single micro-batch holds several snapshots (backlog catch-up
    with ``max_files_per_trigger`` > 1), they are applied sequentially
    in timestamp order — byte-identical to having processed them in
    separate batches. Snapshots at or before the high-water mark (a
    persisted ``<table>__scd2_watermark`` marker of the last APPLIED
    snapshot ts, falling back to max ``effective_from`` for histories
    predating the marker) are SKIPPED with a log line: applying an
    older snapshot on top of newer history would corrupt it, and a
    retroactive correction is a rebuild (replay in order), not an apply.
    """
    raw = (
        spark.readStream.option("header", True)
        .schema(snapshot_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .csv(inbox)
    )

    marker = f"{table}__scd2_watermark"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # runs on the DRIVER (foreachBatch contract); the collects are
        # the distinct snapshot-timestamp list and one max — metadata-scale
        #
        # NULL snapshot_ts first (schema'd CSV nulls any unparseable
        # timestamp under PERMISSIVE): such a row belongs to NO
        # snapshot — left in, the None stamp either crashed the
        # `ts <= high` comparison (TypeError, wedging the stream on
        # permanent replay of the same file) or silently vanished from
        # every staging filter (review finding). They are quarantined
        # to an inspectable side table, batch_id-partitioned so a
        # crash-replay overwrites instead of duplicating.
        bad = batch_df.filter(F.col(snapshot_ts_col).isNull())
        if not bad.isEmpty():
            rejects = f"{table}__scd2_rejects"
            wh.overwrite_partitions(
                bad.withColumn("batch_id", F.lit(batch_id)),
                rejects,
                ["batch_id"],
            )
            print(
                f"[stream_scd2] batch {batch_id}: quarantined rows with "
                f"NULL {snapshot_ts_col} to {rejects}"
            )
        batch_df = batch_df.filter(F.col(snapshot_ts_col).isNotNull())
        stamps = [
            r[0]
            for r in batch_df.select(snapshot_ts_col)
            .distinct()
            .orderBy(snapshot_ts_col)
            .collect()
        ]
        for ts in stamps:
            hist = (
                wh.read(table)
                if wh.has_data(table)
                else empty_history(spark, snapshot_schema, key, attrs)
            )
            # monotonicity guard: SCD2 apply assumes snapshots arrive in
            # time order. A re-delivered OLDER snapshot (corrected file,
            # fresh mtime → new micro-batch) would close newer versions
            # with an effective_to BEFORE their effective_from and
            # append stale rows as open — silent history corruption. A
            # stale snapshot is skipped; correcting history retroactively
            # is a rebuild (replay the snapshots in order), not an apply.
            #
            # The high-water mark is a PERSISTED marker of the last
            # APPLIED snapshot ts, not max(effective_from): a no-change
            # snapshot appends zero rows, so the history alone cannot
            # prove it was seen, and an older re-delivery arriving after
            # it would slip past a history-derived guard (round-3 review
            # finding). max(effective_from) remains the fallback for
            # histories predating the marker. The marker is written
            # AFTER the swap: a crash in between replays the snapshot
            # (a no-op by the replay invariant), then re-writes it.
            high = hist.agg(F.max("effective_from")).first()[0]
            if wh.has_data(marker):
                applied = wh.read(marker).agg(
                    F.max("applied_ts")
                ).first()[0]
                if applied is not None and (high is None or applied > high):
                    high = applied
            if high is not None and ts <= high:
                print(
                    f"[stream_scd2] skipping stale snapshot {ts} "
                    f"(history already at {high})"
                )
                continue
            stg = batch_df.filter(
                F.col(snapshot_ts_col) == F.lit(ts)
            ).drop(snapshot_ts_col)
            nxt = scd2_apply(hist, stg, key, attrs, ts)
            wh.overwrite_versioned(nxt, table)
            wh.overwrite_versioned(
                spark.createDataFrame(
                    [(ts,)], "applied_ts timestamp"
                ),
                marker,
            )

    writer = raw.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
