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
- exactly-once per FILE via the checkpoint; per-batch WRITES are
  idempotent BY CONSTRUCTION: every output table is partitioned by
  ``batch_id`` and written with dynamic partition OVERWRITE, so a
  foreachBatch replay after a crash — including a crash halfway
  through the writes — simply rewrites the same partitions instead of
  appending duplicates. The batch-id marker is then only a fast-skip
  for fully-applied batches, not the correctness mechanism.

Scale: each batch does increment-sized work (bands(new) ⋈ bands(index)
is Σ|bucket|² with the increment side tiny; the index side is
signatures only — see operators/incremental.py). The quarantine frame
rides along so malformed crawler output is visible, not dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import MINHASH_PERMS, _mh_col
from ..operators.incremental import curate_increment
from ..sinks.warehouse import Warehouse
from ..sources.corpus import corrupt_capture_schema, split_documents
from .idempotent import read_index_excluding, run_idempotent_increments


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
    centroids: DataFrame | None = None,
    semantic_index_table: str = "semantic_index",
    semantic_threshold: float = 0.95,
    encoder=None,
    classifier_weights: list[float] | None = None,
    classifier_threshold: float = 0.5,
    presize_buckets: bool = True,
) -> StreamingQuery:
    """Start the landing-zone stream; returns the StreamingQuery.

    Each micro-batch: parse/quarantine split (sources/corpus.py) →
    ``curate_increment`` vs the current ``index_table`` → append
    annotated docs (with ``batch_id``) to ``curated_table``, keepers'
    signatures to ``index_table``, malformed lines to
    ``quarantine_table``.

    Pass ``centroids`` (a FIXED k-means frame — train once, persist
    versioned via operators/annindex.py ``save_ivf_index`` and reload
    with ``load_ivf_index``; retraining invalidates the index, see
    operators/semindex.py) to add the SEMANTIC stage: each batch's
    lexical keepers are embedded (``encoder`` — the deterministic stub
    by default, a real model in production; operators/inference.py) and
    deduped against the persisted quantized embedding index in
    ``semantic_index_table``. Semantic drops get their
    ``index_semantic_dup``/``batch_semantic_dup`` reason in the curated
    table, are EXCLUDED from the minhash index (a dropped doc is not
    corpus), and survivors' index rows append — the full per-crawl
    lexical→semantic maintenance loop, one availableNow pass per cron
    tick.

    ``classifier_weights`` (operators/classifier.py — train offline,
    persist versioned, ``load_classifier`` at stream start) adds the
    trained quality gate as the increment's FIRST stage: rejected docs
    get ``'classifier'``, cost no dedup work, and never enter either
    index.

    ``presize_buckets`` (r9, default on): the hot-bucket thinning
    guard's bucket-size count is the one removable index-proportional
    term per increment (operators/incremental.py
    ``band_bucket_sizes`` — measured in
    tools/scale_smoke_incremental.py). A cron run drains MANY
    micro-batches, so the snapshot is computed ONCE at stream start
    and reused by every batch of the run. Crash-safe by construction:
    the snapshot counts only rows of batches whose APPLIED MARKER
    exists (the marker is written last, so a crashed batch's
    half-written partition is never counted), which makes every
    staleness direction an UNDERCOUNT relative to any batch's own
    index view — under-thinning, never over-thinning, the soundness
    law ``band_bucket_sizes`` documents. Verdicts are pinned identical
    either way; ``False`` restores the per-batch inline count.
    """
    raw = (
        spark.readStream.schema(corrupt_capture_schema())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(inbox)
    )

    marker_table = f"{curated_table}__applied_batches"
    bucket_sizes = None
    if presize_buckets and wh.has_data(index_table):
        from ..operators.incremental import band_bucket_sizes

        idx = wh.read(index_table)
        if "batch_id" in idx.columns:
            # committed batches only: a crashed batch's half-written
            # partition has no marker and must not inflate any count
            # (an overcount could over-thin — the one unsound
            # staleness direction). No marker table at all = NO batch
            # ever committed (the marker is written last), so index
            # data without markers is entirely crash debris: fall back
            # to the inline per-batch count rather than snapshot it
            # (r9 review — the earlier gate skipped the semi-join in
            # exactly the state it exists for)
            if wh.has_data(marker_table):
                applied = wh.read(marker_table).select("batch_id")
                idx = idx.join(applied, "batch_id", "left_semi")
            else:
                idx = None
        if idx is not None:
            bucket_sizes = band_bucket_sizes(idx).localCheckpoint(
                eager=True
            )

    def transform(batch_df: DataFrame, batch_id: int) -> dict[str, DataFrame]:
        # the SAME split the batch reader uses (sources/corpus.py) —
        # batch and stream ingestion cannot drift
        good, bad = split_documents(batch_df)
        good = good.localCheckpoint(eager=True)  # read twice (curate + write)

        # read_index_excluding: a crash-between-writes replay must not
        # match the batch against its OWN half-written signatures —
        # the whole batch would re-curate as near-dup-of-itself
        # (the crawl-stream review finding; same hazard here)
        index = read_index_excluding(wh, index_table, batch_id)
        if index is None:
            index = empty_index(spark)
        annotated, keeper_sigs = curate_increment(
            good,
            index,
            est_threshold=est_threshold,
            exact_threshold=exact_threshold,
            classifier_weights=classifier_weights,
            classifier_threshold=classifier_threshold,
            bucket_sizes=bucket_sizes,
        )
        out = {
            curated_table: annotated,
            index_table: keeper_sigs,
            quarantine_table: bad,
        }
        if centroids is not None:
            from ..operators.inference import embed_texts
            from ..operators.materialize import pin
            from ..operators.semindex import (
                empty_semantic_index,
                semantic_increment,
            )

            lex_keep = annotated.filter(
                F.col("drop_reason").isNull()
            ).select("doc_id", "text")
            # pinned: the model pass is the expensive step and feeds
            # both the index-row build and the annotation join
            emb = pin(embed_texts(lex_keep, id_col="doc_id", encoder=encoder))
            sem_index = read_index_excluding(
                wh, semantic_index_table, batch_id
            )
            if sem_index is None:
                sem_index = empty_semantic_index(spark, "doc_id")
            sem_ann, sem_keep_rows = semantic_increment(
                emb,
                sem_index,
                centroids,
                threshold=semantic_threshold,
                id_col="doc_id",
            )
            # pinned: consumed by the curated-table reason merge AND the
            # minhash-index exclusion — unpinned, the embed mapInPandas
            # pass would re-run per write
            sem_drops = pin(
                sem_ann.filter(F.col("drop_reason").isNotNull()).select(
                    "doc_id", F.col("drop_reason").alias("_sem_reason")
                )
            )
            out[curated_table] = annotated.join(
                sem_drops, "doc_id", "left"
            ).select(
                *[c for c in annotated.columns if c != "drop_reason"],
                F.coalesce(
                    F.col("drop_reason"), F.col("_sem_reason")
                ).alias("drop_reason"),
            )
            out[index_table] = keeper_sigs.join(
                sem_drops.select("doc_id"), "doc_id", "left_anti"
            )
            out[semantic_index_table] = sem_keep_rows
        return out

    return run_idempotent_increments(
        spark,
        raw,
        wh,
        checkpoint_dir,
        f"{curated_table}__applied_batches",
        transform,
        processing_time,
    )
