"""Live enriched transaction feed: the nightly denormalized view as a
stream.

The reference's mart pipeline joins each day's transactions to the
dimension versions current at processing time (main.py:392-421, via the
`s_20_v_terminals_hist` as-of view). This module runs the SAME join
chain (plans/fraud.enrich_transactions — one definition, no drift)
continuously: every transactions micro-batch is denormalized against
the terminal dimension version current AT THAT BATCH and appended to a
live table.

Dimension freshness: the terminal dim is re-read from the warehouse
INSIDE each foreachBatch call, not bound into a stream-static join.
Spark's stream-static join re-executes the static side per micro-batch,
but file-source listings can be cached by the `InMemoryFileIndex`, and
our SCD2 layout swaps a version DIRECTORY nightly — re-reading through
the Warehouse per batch guarantees at-processing-time versions with no
listing-staleness caveat, and costs one dim read per batch (dim-sized,
broadcast into the join).

Exactly-once: the shared idempotent harness (streaming/idempotent.py) —
checkpointed file source, batch_id-partition overwrite writes, marker
fast-skip — so a crash mid-batch replays into the same partitions
instead of duplicating enriched rows.

No row left behind: the enrichment joins are INNER (the nightly mart's
faithful shape), so a transaction whose dimension rows have not landed
yet would otherwise vanish while the checkpoint consumed its file.
Unmatched rows are parked in ``rep_live_pending`` (batch_id-partitioned
like every harness output) and retried by every subsequent batch until
the dims catch up; an anti-join against the live table keeps the
retries exactly-once. Drained pending partitions are retained (they are
inert — duplicate-filtered on every read); prune them with the
warehouse retention tooling if the table ever matters for storage.

Scale: per micro-batch cost is batch-rows × (4 broadcast joins), the
nightly view's own shape; nothing accumulates in streaming state (the
enrichment is stateless — the stateful fraud rules live in
streaming/bandjoin.py and streaming/rollup.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.materialize import pin
from ..operators.scd import scd2_current
from ..pipeline import T_HIST
from ..plans.fraud import enrich_transactions
from ..sinks.warehouse import Warehouse
from .idempotent import read_index_excluding, run_idempotent_increments
from .inbox import stream_transactions

T_LIVE = "rep_live_enriched"
T_PENDING = "rep_live_pending"
MARKER = "rep_live_enriched__applied"


def stream_enriched_transactions(
    spark: SparkSession,
    inbox: str,
    wh: Warehouse,
    checkpoint_dir: str,
    bank_tables,
    *,
    as_of: dt.datetime | None = None,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the live enrichment stream; returns the StreamingQuery.

    ``as_of`` pins the dimension as-of timestamp (deterministic replay /
    tests); None uses ``current_timestamp()`` — the live semantics where
    each batch sees the dim version open at its own processing moment.
    Default trigger is availableNow (drain-then-stop, the cron twin);
    ``processing_time`` makes it resident.

    ``bank_tables`` is either a ``{clients, accounts, cards}`` dict of
    DataFrames or a ZERO-ARG CALLABLE returning one, invoked inside
    every micro-batch. The distinction matters on a resident stream: a
    DataFrame dict is bound ONCE at stream start — for parquet-backed
    frames the file listing is cached at DataFrame creation, so rows
    appended to those dims later are invisible for the stream's
    lifetime, and a transaction parked in ``rep_live_pending`` waiting
    on a late card/account/client would be retried against the stale
    listing forever (r8 review; the module docstring's T_HIST staleness
    argument applies to all four dims). Pass a callable (e.g.
    ``lambda: {k: wh.read(k) for k in ...}``) to give the other three
    dims the same at-processing-time freshness T_HIST already has;
    plain dicts remain right for genuinely static fixture dims.
    """
    stream = stream_transactions(
        spark, inbox, max_files_per_trigger=max_files_per_trigger
    )

    def transform(batch_df: DataFrame, batch_id: int) -> dict[str, DataFrame]:
        if not wh.has_data(T_HIST):
            # FAIL the batch rather than enrich against an empty dim: an
            # inner join to nothing yields zero rows, the harness would
            # still mark the batch applied and the checkpoint would
            # consume the files — the batch's transactions silently and
            # PERMANENTLY lost (round-4 review finding). Raising leaves
            # the checkpoint unadvanced; the stream resumes cleanly once
            # the nightly dim load has run.
            raise RuntimeError(
                f"live mart: dimension table '{T_HIST}' is missing or "
                "empty — start the stream after the first terminals load"
            )
        hist = wh.read(T_HIST)
        ts = as_of if as_of is not None else F.current_timestamp()
        trm = scd2_current(hist, ts).select(
            "terminal_id", "terminal_type", "terminal_city"
        )
        # pin the batch: it feeds the enrichment, the unmatched
        # anti-join, and (on retry batches) the pending anti-join —
        # unpinned, every one of those actions re-parses the batch's
        # CSV files (the streaming smoke's engine metrics showed the
        # source scanned 3x per batch — r8)
        batch_df = pin(batch_df)
        # Retry loop for dim-less rows (round-4 review finding #2): the
        # enrichment is a chain of INNER joins, so a transaction whose
        # terminal/card/account/client has not reached the warehouse yet
        # (a terminal live intra-day before the nightly dim load) would
        # produce no output while the checkpoint still consumed its
        # file — per-ROW silent permanent loss, the same failure the
        # empty-dim guard above blocks per-batch. Instead, unmatched
        # rows land in T_PENDING and are retried on every subsequent
        # batch until the dims catch up:
        #
        # - carry-in = all pending partitions EXCEPT this batch's own
        #   (read_index_excluding — the replay rule), minus anything
        #   already enriched into T_LIVE (a row is retried by every
        #   later batch until it matches, so older pending partitions
        #   keep already-drained copies; the anti-join makes the
        #   re-reads harmless and replay idempotent by construction);
        # - the T_LIVE anti-join reads ONE column (trans_id) of the
        #   live table and is skipped entirely in the common case of no
        #   pending rows, so the steady-state batch cost is unchanged.
        pending = read_index_excluding(wh, T_PENDING, batch_id)
        if pending is not None and not pending.isEmpty():
            done = read_index_excluding(wh, T_LIVE, batch_id)
            if done is not None:
                pending = pending.join(
                    done.select("trans_id"), "trans_id", "left_anti"
                )
            # a trans_id BOTH parked in pending and re-delivered in this
            # batch's own files would enrich twice through the union —
            # anti-join pending against the batch so the batch's copy
            # (the fresher delivery, possibly a correction) wins
            # (ADVICE round 4)
            pending = pending.join(
                batch_df.select("trans_id"), "trans_id", "left_anti"
            )
            batch_df = batch_df.unionByName(
                pending.dropDuplicates(["trans_id"])
            )
        # a callable provider re-resolves the dims INSIDE the batch —
        # fresh file listings per micro-batch, the same
        # at-processing-time law the T_HIST re-read above follows
        tables = bank_tables() if callable(bank_tables) else bank_tables
        # pinned: the 4-way join otherwise evaluates once for the
        # T_LIVE write, once inside the unmatched anti-join, and once
        # for the harness's emptiness probe
        enriched = pin(
            enrich_transactions(
                batch_df,
                trm,
                tables["clients"],
                tables["accounts"],
                tables["cards"],
            )
        )
        unmatched = batch_df.join(
            enriched.select("trans_id"), "trans_id", "left_anti"
        )
        return {T_LIVE: enriched, T_PENDING: unmatched}

    return run_idempotent_increments(
        spark,
        stream,
        wh,
        checkpoint_dir,
        MARKER,
        transform,
        processing_time=processing_time,
    )
