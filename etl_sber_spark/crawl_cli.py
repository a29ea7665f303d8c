"""Cron-shaped CLI for the crawl landing zone: one ingestion run.

One stage upstream of ``python -m etl_sber_spark.corpus_cli``: drain a
raw-page JSONL inbox (doc_id, url, html) as ONE availableNow pass of
the crawl stream — extract, canonicalize, gate, dedupe against the
persisted URL index — then print the warehouse's CUMULATIVE funnel
(all runs to date, not just this increment — diff two runs' lines for
per-run throughput) as one JSON line::

    python -m etl_sber_spark.crawl_cli \
        --inbox /data/fetch_inbox --warehouse /data/crawl_wh \
        [--blocklist domains.txt] [--allowlist domains.txt]

Domain lists are plain text files, one domain per line (suffix match —
"example.com" covers its subdomains). Re-running with a drained inbox
is a no-op; crash-replay is idempotent (streaming/idempotent.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="python -m etl_sber_spark.crawl_cli",
        description="Drain the raw-page crawl inbox: extract text, "
        "canonicalize URLs, apply domain lists, dedupe vs the URL index.",
    )
    p.add_argument("--inbox", required=True, help="raw-page JSONL directory")
    p.add_argument(
        "--warehouse", required=True, help="crawl warehouse root directory"
    )
    p.add_argument("--blocklist", help="text file of blocked domains")
    p.add_argument("--allowlist", help="text file of allowed domains")
    p.add_argument(
        "--min-chars",
        type=int,
        default=1,
        help="minimum extracted-text length (default 1)",
    )
    p.add_argument(
        "--keep-noindex",
        action="store_true",
        help="ingest pages despite a robots noindex directive",
    )
    p.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=1,
        help="files per micro-batch (default 1)",
    )
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from .session import get_spark
    from .sinks.warehouse import Warehouse
    from .streaming.crawl import stream_crawl_increments

    spark = get_spark("crawl-ingestion")

    def _domains(path: str | None):
        if not path:
            return None
        with open(path) as f:
            rows = [(ln.strip(),) for ln in f if ln.strip()]
        return spark.createDataFrame(rows, "domain string")

    wh = Warehouse(spark, args.warehouse)
    q = stream_crawl_increments(
        spark,
        args.inbox,
        wh,
        os.path.join(args.warehouse, "_crawl_checkpoint"),
        blocklist=_domains(args.blocklist),
        allowlist=_domains(args.allowlist),
        min_chars=args.min_chars,
        respect_noindex=not args.keep_noindex,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    q.awaitTermination()

    _count = wh.count_or_zero

    funnel: dict[str, int] = {}
    kept = 0
    if wh.has_data("crawl_pages"):
        for r in (
            wh.read("crawl_pages").groupBy("drop_reason").count().collect()
        ):
            if r["drop_reason"] is None:
                kept = r["count"]
            else:
                funnel[r["drop_reason"]] = r["count"]
    # cumulative warehouse totals (see module docstring)
    print(
        json.dumps(
            {
                "warehouse": args.warehouse,
                "pages_total": kept + sum(funnel.values()),
                "kept_total": kept,
                "dropped": funnel,
                "url_index_size": _count("url_index"),
                "quarantined_total": _count("crawl_quarantine"),
            },
            sort_keys=True,
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
