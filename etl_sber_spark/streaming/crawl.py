"""Continuous crawl ingestion: raw (url, html) JSONL → curate-ready pages.

The landing zone ONE stage upstream of streaming/corpus.py: a fetcher
drops raw pages as JSONL; each micro-batch runs
operators/crawl.preprocess_crawl (extract text, canonicalize the URL,
domain lists, in-batch URL dedup) and then dedupes against the
PERSISTED URL index — the url_canon analog of the minhash signature
index — so a page re-fetched in a later crawl is dropped without ever
re-reading earlier batches. Keepers' canonical URLs append to the
index; annotated pages land in a pages table the corpus pipeline
(curate / curate_increment) consumes.

Execution discipline is identical to stream_corpus_increments:
foreachBatch (multi-output + reads warehouse state), availableNow by
default, exactly-once per file via the checkpoint, and every write a
``batch_id``-partition OVERWRITE so crash replays rewrite rather than
duplicate; the marker table is a fast-skip, not the correctness
mechanism.

Scale: preprocess_crawl is projections + one batch-sized dedup
aggregate; the index join is batch-distinct-URLs ⋈ index on the
canonical URL (AQE broadcasts the batch side); index rows are
(url_canon, doc_id) only — bytes per retained page, never page text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.crawl import R_URL_DUP, preprocess_crawl
from ..sinks.warehouse import Warehouse
from ..sources.corpus import corrupt_capture_schema, split_documents
from .idempotent import read_index_excluding, run_idempotent_increments

#: raw fetcher drop: id + url are required; html may be NULL (fetch
#: failure — preprocess_crawl drops it as empty_text, keeping the row
#: visible in the annotated output rather than quarantined)
PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("html", T.StringType()),
    ]
)
PAGE_REQUIRED = ("doc_id", "url")


def url_dup_probe(index: DataFrame, batch_urls: DataFrame) -> DataFrame:
    """``(url_canon, _in_index=true)`` for every batch url the standing
    index already holds — the cross-batch url-dedup probe, shaped so
    NOTHING index-sized ever shuffles (r10).

    The previous shape distinct-ed the WHOLE url index per micro-batch
    — an index-proportional Exchange on every trigger, the same term
    class the corpus loop's presized bucket counts removed (SCALE.md).
    Here the index is probed with a BROADCAST semi-join of the batch's
    distinct urls: the index side is scan-only (no Exchange above its
    scan — plan-pinned in tests/test_crawl_stream.py), and everything
    downstream (distinct, the annotate join) is batch-bounded. The
    broadcast bound is the batch's distinct urls — this loop already
    localCheckpoints the whole batch, so batch-sized memory is its
    standing contract. The index SCAN itself stays per-trigger: canon
    urls are hash-uniform, no static layout can file-prune an
    arbitrary batch's probe set (the same finding as the band layout's
    — see SCALE.md); the scalable property is scan-without-shuffle.
    The distinct after the semi-join guards row multiplication in the
    caller's left join even if the index ever held duplicate
    ``url_canon`` rows."""
    return (
        index.join(F.broadcast(batch_urls), "url_canon", "left_semi")
        .select("url_canon")
        .distinct()
        .withColumn("_in_index", F.lit(True))
    )


def stream_crawl_increments(
    spark: SparkSession,
    inbox: str,
    wh: Warehouse,
    checkpoint_dir: str,
    *,
    pages_table: str = "crawl_pages",
    url_index_table: str = "url_index",
    quarantine_table: str = "crawl_quarantine",
    blocklist: DataFrame | None = None,
    allowlist: DataFrame | None = None,
    min_chars: int = 1,
    respect_noindex: bool = True,
    max_files_per_trigger: int = 1,
    processing_time: str | None = None,
    host_edges_table: str | None = None,
) -> StreamingQuery:
    """Start the crawl landing-zone stream; returns the StreamingQuery.

    Each micro-batch: parse/quarantine split (the shared
    sources/corpus.py helper with the page schema) → preprocess_crawl
    (in-batch gates + URL dedup) → index check (keepers whose
    ``url_canon`` is already in ``url_index_table`` become
    ``'url_dup'``) → batch_id-partition overwrites of the annotated
    pages, the new index entries, the quarantine, and the marker.

    ``host_edges_table`` additionally accumulates the host-level link
    graph (operators/pagerank.host_link_edges over each batch's RAW
    pages — links from dropped pages still carry endorsement; only the
    linking page needs to have been fetched, not kept). The table is
    the edge feed for :func:`..operators.pagerank.pagerank` — rank the
    accumulated graph as a periodic batch job (dedupe with
    ``distinct()`` across batches first: the same edge re-observed in
    a later crawl lands in a new batch_id partition, and PageRank
    counts duplicate rows once each).
    """
    raw = (
        spark.readStream.schema(corrupt_capture_schema(PAGE_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(inbox)
    )

    def transform(batch_df: DataFrame, batch_id: int) -> dict[str, DataFrame]:
        good, bad = split_documents(batch_df, PAGE_SCHEMA, PAGE_REQUIRED)
        annotated = preprocess_crawl(
            good,
            blocklist=blocklist,
            allowlist=allowlist,
            min_chars=min_chars,
            respect_noindex=respect_noindex,
        ).localCheckpoint(eager=True)  # consumed by 2 writes + the index diff

        # cross-batch URL dedup: in-batch keepers whose canonical URL
        # the index already holds were fetched by an EARLIER crawl.
        # read_index_excluding drops this batch's own partition — on a
        # crash-between-writes replay the half-written index would
        # otherwise re-mark the batch's own keepers as url_dup
        # (review finding, pinned by test_crawl_stream_replay_is_idempotent)
        index = read_index_excluding(wh, url_index_table, batch_id)
        if index is not None:
            # the PROBE RESULT is pinned, not the post-join batch
            # (r11): the r8 fix re-checkpointed the whole annotated
            # frame after the join so the three consumers (pages
            # write, keepers write, emptiness probes) would not
            # re-execute the index scan per consumer — but that paid a
            # SECOND batch-sized materialize+reread every trigger
            # (attributed at ~0.65 s of the ~3.2 s/trigger floor,
            # tools/profile_crawl_trigger.py; the cost is
            # batch-proportional, so it grows with trigger size).
            # index_urls is ≤ the batch's distinct urls — pinning IT
            # keeps the index scan once-per-trigger while consumers
            # re-run only a broadcast hash join over the
            # already-checkpointed batch blocks. Explicit broadcast:
            # the checkpointed frame carries no size stats for the
            # planner's own threshold choice, and batch-sized
            # broadcast is this loop's standing memory contract.
            index_urls = url_dup_probe(
                index, annotated.select("url_canon").distinct()
            ).localCheckpoint(eager=True)
            annotated = (
                annotated.join(
                    F.broadcast(index_urls), "url_canon", "left"
                )
                .withColumn(
                    "drop_reason",
                    F.coalesce(
                        "drop_reason",
                        F.when(F.col("_in_index"), F.lit(R_URL_DUP)),
                    ),
                )
                .drop("_in_index")
            )
        keepers = annotated.filter(F.col("drop_reason").isNull())
        out = {
            pages_table: annotated,
            url_index_table: keepers.select("url_canon", "doc_id"),
            quarantine_table: bad,
        }
        if host_edges_table is not None:
            from ..operators.pagerank import host_link_edges

            out[host_edges_table] = host_link_edges(good)
        return out

    return run_idempotent_increments(
        spark,
        raw,
        wh,
        checkpoint_dir,
        f"{pages_table}__applied_batches",
        transform,
        processing_time,
    )
