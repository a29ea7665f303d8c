"""Cron-shaped CLI for the corpus landing zone: one maintenance run.

The LLM-pipeline twin of ``python -m etl_sber_spark`` (the bank nightly
batch): drain the JSONL inbox as ONE availableNow pass of the
incremental-curation stream, then print warehouse totals as one JSON
line. The totals are CUMULATIVE across all runs to date (curated_total,
kept_total, index_size — the same convention as crawl_cli); a single
run's throughput is the diff of two consecutive runs' lines::

    python -m etl_sber_spark.corpus_cli \
        --inbox /data/crawl_inbox --warehouse /data/corpus_wh

Each invocation picks up exactly the files not yet processed (the
stream checkpoint lives under the warehouse root), dedupes the new
documents against the persisted minhash signature index, appends
curated rows / keeper signatures / quarantined lines, and reports
totals. Re-running with a drained inbox is a no-op; crash-replay is
idempotent (streaming/corpus.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="python -m etl_sber_spark.corpus_cli",
        description="Drain the JSONL corpus inbox: incremental "
        "near-dup curation against the persisted signature index.",
    )
    p.add_argument("--inbox", required=True, help="JSONL landing directory")
    p.add_argument(
        "--warehouse", required=True, help="corpus warehouse root directory"
    )
    p.add_argument(
        "--est-threshold",
        type=float,
        default=0.5,
        help="estimated-Jaccard drop threshold vs the index (default 0.5)",
    )
    p.add_argument(
        "--exact-threshold",
        type=float,
        default=0.8,
        help="exact n-gram Jaccard drop threshold in-batch (default 0.8)",
    )
    p.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=1,
        help="files per micro-batch = per curation increment (default 1)",
    )
    p.add_argument(
        "--classifier-table",
        default=None,
        help="versioned warehouse table holding trained quality-"
        "classifier weights (operators/classifier.py save_classifier); "
        "when set, each increment gates documents on the classifier "
        "score before any dedup work",
    )
    p.add_argument(
        "--classifier-threshold",
        type=float,
        default=0.5,
        help="minimum classifier score to keep a document (default 0.5)",
    )
    p.add_argument(
        "--centroids-table",
        default=None,
        help="versioned warehouse table holding the frozen k-means "
        "quantizer (operators/annindex.py save_ivf_index — the same "
        "artifact IVF search uses); when set, each increment adds the "
        "SEMANTIC dedup stage: lexical keepers are embedded, deduped "
        "against the persisted quantized embedding index, and "
        "survivors' index rows appended",
    )
    p.add_argument(
        "--semantic-threshold",
        type=float,
        default=0.95,
        help="quantized-cosine drop threshold for the semantic stage "
        "(default 0.95; only with --centroids-table)",
    )
    p.add_argument(
        "--encoder",
        choices=("stub", "auto"),
        default="stub",
        help="text encoder for the semantic stage: 'stub' (the "
        "deterministic hash encoder — CI/dev) or 'auto' (best "
        "importable real model via operators/inference.auto_encoder; "
        "refuses when no embedding runtime is installed, because "
        "silently falling back would index stub vectors against a "
        "real-model quantizer). Only with --centroids-table; the "
        "encoder must match the one the quantizer was trained on",
    )
    p.add_argument(
        "--bootstrap-serving-table",
        default=None,
        help="one-time seed: adapt this ANN serving table "
        "(`ann_cli build --sq8` layout, in THIS warehouse) into the "
        "semantic index before draining the inbox, so the first "
        "increment already dedupes against the standing ANN corpus — "
        "no re-embedding pass. Idempotent (fixed bootstrap "
        "partition); requires --centroids-table",
    )
    p.add_argument(
        "--band-index-table",
        default=None,
        help="keep the signature index's hashed band layout in "
        "lockstep in this table (streaming/corpus.py "
        "sync_band_index): each increment probes the standing corpus "
        "through a two-bigint-column scan instead of re-exploding "
        "all signature columns. Self-backfills at stream start, so "
        "it can be enabled on a standing warehouse",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from .session import get_spark
    from .sinks.warehouse import Warehouse
    from .streaming.corpus import stream_corpus_increments

    spark = get_spark("corpus-maintenance")
    wh = Warehouse(spark, args.warehouse)
    weights = None
    if args.classifier_table:
        from .operators.classifier import load_classifier

        weights = load_classifier(wh, args.classifier_table)
    centroids = None
    if args.centroids_table:
        from .operators.annindex import load_ivf_index

        if not wh.has_data(args.centroids_table):
            raise SystemExit(
                f"centroids table {args.centroids_table!r} has no data "
                f"in warehouse {args.warehouse!r} — train and persist "
                "the quantizer first (operators/annindex.py "
                "save_ivf_index, or `ann_cli build` in the ANN "
                "warehouse)"
            )
        centroids = load_ivf_index(wh, args.centroids_table)
    encoder = None
    if args.encoder == "auto":
        if not args.centroids_table:
            raise SystemExit(
                "--encoder auto has no effect without --centroids-table "
                "(the semantic stage is off) — refusing instead of "
                "silently ignoring the flag"
            )
        from .operators.inference import auto_encoder

        encoder = auto_encoder()
        if encoder is None:
            raise SystemExit(
                "--encoder auto: no embedding runtime importable "
                "(sentence-transformers absent) — install one, or use "
                "--encoder stub with a stub-trained quantizer; a silent "
                "stub fallback would index stub vectors against a "
                "real-model quantizer"
            )
    if args.bootstrap_serving_table:
        if centroids is None:
            raise SystemExit(
                "--bootstrap-serving-table requires --centroids-table "
                "(the semantic stage that would consume the seeded "
                "index is otherwise off)"
            )
        from .operators.semindex import bootstrap_semantic_index

        seeded = bootstrap_semantic_index(
            wh,
            args.bootstrap_serving_table,
            id_col="vec_id",
            index_id_col="doc_id",
        )
        print(
            json.dumps(
                {"bootstrap_serving_table": args.bootstrap_serving_table,
                 "semantic_index_seeded": seeded}
            ),
            file=sys.stderr,
        )
    q = stream_corpus_increments(
        spark,
        args.inbox,
        wh,
        os.path.join(args.warehouse, "_corpus_checkpoint"),
        est_threshold=args.est_threshold,
        exact_threshold=args.exact_threshold,
        max_files_per_trigger=args.max_files_per_trigger,
        classifier_weights=weights,
        classifier_threshold=args.classifier_threshold,
        centroids=centroids,
        semantic_threshold=args.semantic_threshold,
        encoder=encoder,
        band_index_table=args.band_index_table,
    )
    q.awaitTermination()

    _count = wh.count_or_zero

    kept = dropped = 0
    if wh.has_data("curated_docs"):
        by = {
            r[0]: r[1]
            for r in wh.read("curated_docs")
            .groupBy(F.col("drop_reason").isNull().alias("kept"))
            .count()
            .collect()
        }
        kept, dropped = by.get(True, 0), by.get(False, 0)
    print(
        json.dumps(
            {
                "warehouse": args.warehouse,
                "curated_total": kept + dropped,
                "kept_total": kept,
                "dropped_total": dropped,
                "index_size": _count("minhash_index"),
                "semantic_index_size": _count("semantic_index"),
                "quarantined_total": _count("corpus_quarantine"),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
