#!/usr/bin/env python3
"""Attribute the crawl-ingest per-trigger floor (VERDICT r10 #4).

The composed e2e's crawl_ingest phase reads ~29 s at EVERY factor — 8
micro-batches at max_files_per_trigger=1, so a fixed ~3.6 s/trigger
term dominates long before data volume does. This tool answers two
questions the e2e can't:

1. **Trigger-size scaling**: same inbox (8 JSONL files), a fresh
   stream at max_files_per_trigger 1/2/4/8 — if the floor is
   per-TRIGGER (engine + harness + per-output commit rounds), halving
   the trigger count should halve the flat term; if it were per-FILE
   (listing/open costs), it wouldn't move.
2. **Floor attribution at mft=1**: the same inbox through
   run_idempotent_increments with a MINIMAL transform (one
   pass-through output table) — separating the harness floor (stream
   engine offset/commit logs + marker fast-skip probe + one
   dynamic-partition overwrite + marker write) from the crawl
   transform's own term (preprocess projections, two eager
   localCheckpoints, the standing-index probe join, and 2-3 more
   table writes, each an isEmpty probe + overwrite commit round).

Semantics note (why max_files_per_trigger is a POLICY knob, not just a
perf knob): in-batch URL dedup keeps the min doc_id per url_canon
(operators/crawl.py), cross-batch dedup keeps the EARLIEST BATCH's
page. Merging files into one trigger therefore changes which duplicate
wins whenever a url spans files and the min-id page is in a later
file. Both are legitimate one-fetch-per-url policies; outputs are
identical whenever urls do not repeat across files (this profiler's
inbox, where the url embeds doc_id — keeper counts are asserted equal
across all runs).

Usage: python tools/profile_crawl_trigger.py [sf_dir] [factor]
Prints one JSON line: {"phase_walls": {...}, "per_trigger": {...}, ...}
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_sber_spark.session import get_spark  # noqa: E402
from etl_sber_spark.sinks.warehouse import Warehouse  # noqa: E402
from etl_sber_spark.streaming.crawl import (  # noqa: E402
    PAGE_SCHEMA,
    stream_crawl_increments,
)
from etl_sber_spark.streaming.idempotent import (  # noqa: E402
    run_idempotent_increments,
)

N_FILES = 8


def build_inbox(spark, sf_dir: str, factor: int, inbox: str) -> int:
    """The e2e smoke's synthetic raw-page inbox (same shape/urls)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pages = (
        d.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k"),
        )
        .select(
            (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.concat(
                F.lit("https://site"),
                F.pmod(F.col("doc_id"), F.lit(997)),
                F.lit(".example.com/p/"),
                F.col("doc_id") + F.col("k") * F.lit(10_000_000),
            ).alias("url"),
            F.concat(
                F.lit("<html><head><title>t</title></head><body><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ).alias("html"),
        )
    )
    os.makedirs(inbox, exist_ok=True)
    with tempfile.TemporaryDirectory() as stg:
        for i in range(N_FILES):
            part = pages.filter(
                F.pmod(F.col("doc_id"), F.lit(N_FILES)) == i
            ).coalesce(1)
            part.write.mode("overwrite").json(stg)
            f = glob.glob(os.path.join(stg, "part-*"))[0]
            shutil.move(f, os.path.join(inbox, f"crawl_{i:02d}.jsonl"))
    return pages.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("profile-crawl-trigger")
    out: dict = {"sf_dir": sf_dir, "factor": factor, "n_files": N_FILES}
    with tempfile.TemporaryDirectory() as tmp:
        inbox = os.path.join(tmp, "inbox")
        out["n_pages"] = build_inbox(spark, sf_dir, factor, inbox)

        walls: dict[str, float] = {}
        per_trigger: dict[str, float] = {}
        kept_counts: dict[str, int] = {}

        # -- 1. trigger-size ladder -----------------------------------
        for mft in (1, 2, 4, 8):
            wh = Warehouse(spark, os.path.join(tmp, f"wh_{mft}"))
            t0 = time.perf_counter()
            q = stream_crawl_increments(
                spark,
                inbox,
                wh,
                os.path.join(tmp, f"ck_{mft}"),
                max_files_per_trigger=mft,
            )
            q.awaitTermination()
            wall = round(time.perf_counter() - t0, 2)
            n_trig = (N_FILES + mft - 1) // mft
            walls[f"mft{mft}"] = wall
            per_trigger[f"mft{mft}"] = round(wall / n_trig, 2)
            kept_counts[f"mft{mft}"] = (
                wh.read("crawl_pages")
                .filter(F.col("drop_reason").isNull())
                .count()
            )

        # -- 2. harness-floor run: minimal transform at mft=1 ---------
        raw = (
            spark.readStream.schema(PAGE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(inbox)
        )
        wh0 = Warehouse(spark, os.path.join(tmp, "wh_floor"))

        def passthrough(batch_df, batch_id):
            return {"floor_pages": batch_df.select("doc_id", "url")}

        t0 = time.perf_counter()
        q = run_idempotent_increments(
            spark,
            raw,
            wh0,
            os.path.join(tmp, "ck_floor"),
            "floor__applied_batches",
            passthrough,
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        walls["floor_mft1"] = wall
        per_trigger["floor_mft1"] = round(wall / N_FILES, 2)

        out["phase_walls"] = walls
        out["per_trigger"] = per_trigger
        out["pages_kept"] = kept_counts
        assert len(set(kept_counts.values())) == 1, kept_counts
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
