"""Continuous corpus maintenance from a JSONL landing zone.

Composes the pieces into the loop a live training-data pipeline runs:
crawler drops JSONL files into an inbox; each micro-batch becomes one
curation INCREMENT (operators/incremental.py) against the persisted
minhash signature index; annotated documents append to a curated table
and keepers' signatures append to the index — so the next batch dedupes
against the grown corpus, and the corpus text is never re-read.

Same execution discipline as the continuous SCD2 stream
(streaming/scd.py):

- ``foreachBatch``: the increment is multi-output (curated rows + index
  rows + quarantine) and reads warehouse state (the index) — batch
  semantics inside a checkpointed stream;
- default ``availableNow`` trigger (drain the backlog, then stop — the
  cron shape); ``processing_time`` for a resident stream;
- exactly-once per FILE via the checkpoint; the batch-id marker makes
  crash-replay of a half-applied batch idempotent: a re-delivered batch
  id whose appends already committed is skipped (the appends are the
  non-idempotent step — blind re-append would duplicate curated rows
  and index signatures).

Scale: each batch does increment-sized work (bands(new) ⋈ bands(index)
is Σ|bucket|² with the increment side tiny; the index side is
signatures only — see operators/incremental.py). The quarantine frame
rides along so malformed crawler output is visible, not dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import MINHASH_PERMS, _mh_col
from ..operators.incremental import curate_increment
from ..sinks.warehouse import Warehouse
from ..sources.corpus import DOCUMENT_SCHEMA, REQUIRED, read_documents_jsonl


def empty_index(spark: SparkSession, id_col: str = "doc_id") -> DataFrame:
    schema = ", ".join(
        [f"{id_col} bigint"] + [f"{_mh_col(k)} bigint" for k in range(len(MINHASH_PERMS))]
    )
    return spark.createDataFrame([], schema)


def stream_corpus_increments(
    spark: SparkSession,
    inbox: str,
    wh: Warehouse,
    checkpoint_dir: str,
    *,
    curated_table: str = "curated_docs",
    index_table: str = "minhash_index",
    quarantine_table: str = "corpus_quarantine",
    est_threshold: float = 0.5,
    exact_threshold: float = 0.8,
    max_files_per_trigger: int = 1,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Start the landing-zone stream; returns the StreamingQuery.

    Each micro-batch: parse/quarantine split (sources/corpus.py) →
    ``curate_increment`` vs the current ``index_table`` → append
    annotated docs (with ``batch_id``) to ``curated_table``, keepers'
    signatures to ``index_table``, malformed lines to
    ``quarantine_table``.
    """
    # copy, never .add() on the shared schema: StructType.add mutates
    # and returns self (the build_mart round-3 review finding)
    full_schema = T.StructType(
        [*DOCUMENT_SCHEMA.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.readStream.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(inbox)
    )
    marker = f"{curated_table}__applied_batches"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotence marker: foreachBatch replays a batch after a crash
        # mid-append; the appends below are not idempotent, so an
        # already-marked batch id is skipped wholesale.
        if wh.has_data(marker):
            done = {r[0] for r in wh.read(marker).collect()}
            if batch_id in done:
                print(f"[stream_corpus] batch {batch_id} already applied")
                return
        cols = [f.name for f in DOCUMENT_SCHEMA.fields]
        missing = F.coalesce(
            *[F.when(F.col(c).isNull(), F.lit(f"missing:{c}")) for c in REQUIRED]
        )
        good = (
            batch_df.filter(F.col("_corrupt_record").isNull() & missing.isNull())
            .select(*cols)
            .withColumn("n_chars", F.length("text").cast("long"))
            .localCheckpoint(eager=True)  # read twice (curate + append)
        )
        bad = batch_df.filter(
            F.col("_corrupt_record").isNotNull() | missing.isNotNull()
        ).select(
            F.coalesce(
                F.col("_corrupt_record"), F.to_json(F.struct(*cols))
            ).alias("raw"),
            F.coalesce(
                F.when(F.col("_corrupt_record").isNotNull(), F.lit("unparseable")),
                missing,
            ).alias("reason"),
        )

        index = (
            wh.read(index_table)
            if wh.has_data(index_table)
            else empty_index(spark)
        )
        annotated, keeper_sigs = curate_increment(
            good,
            index,
            est_threshold=est_threshold,
            exact_threshold=exact_threshold,
        )
        wh.append(
            annotated.withColumn("batch_id", F.lit(batch_id)), curated_table
        )
        wh.append(keeper_sigs, index_table)
        if not bad.isEmpty():
            wh.append(
                bad.withColumn("batch_id", F.lit(batch_id)), quarantine_table
            )
        wh.append(
            spark.createDataFrame([(batch_id,)], "batch_id bigint"), marker
        )

    writer = raw.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
