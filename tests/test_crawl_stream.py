"""Crawl landing-zone stream (streaming/crawl.py): cross-batch URL
dedup against the persisted index, quarantine, replay idempotence."""

from __future__ import annotations

import pytest

import json
from pathlib import Path

from pyspark.sql import functions as F

from etl_sber_spark.operators.crawl import R_EMPTY, R_URL_DUP
from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.streaming.crawl import stream_crawl_increments


#: r12 suite tiering (VERDICT r11 #3): multi-trigger crawl streams; batch crawl logic fast-covered by test_crawl.
pytestmark = pytest.mark.slow

HTML_A = "<p>first page with plenty of ordinary words</p>"
HTML_B = "<p>a different page about other things entirely</p>"
HTML_C = "<p>third page fresh content for batch two</p>"


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")


def _run(spark, inbox, wh, ckpt, **kw):
    q = stream_crawl_increments(spark, str(inbox), wh, str(ckpt), **kw)
    q.awaitTermination()


def test_crawl_stream_cross_batch_url_dedup(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"

    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "url": "https://www.site.org/a/?utm_source=x", "html": HTML_A},
            {"doc_id": 2, "url": "https://site.org/b", "html": HTML_B},
            {"doc_id": 3, "url": "https://site.org/fail", "html": None},
            '{"doc_id": 4, "url": "https://site.org/broken", ',  # unparseable
            {"doc_id": None, "url": "https://site.org/noid", "html": HTML_A},
        ],
    )
    _run(spark, inbox, wh, ckpt)

    pages = {r.doc_id: r for r in wh.read("crawl_pages").collect()}
    assert set(pages) == {1, 2, 3}
    assert pages[1].drop_reason is None
    assert pages[2].drop_reason is None
    assert pages[3].drop_reason == R_EMPTY  # NULL html
    bad = sorted(r.reason for r in wh.read("crawl_quarantine").collect())
    assert bad == ["missing:doc_id", "unparseable"]
    idx = {(r.url_canon, r.doc_id) for r in wh.read("url_index").collect()}
    assert idx == {("https://site.org/a", 1), ("https://site.org/b", 2)}

    # batch 2: a URL-variant refetch of page 1 (different doc_id) must
    # dedupe against the INDEX, not the batch; plus one fresh page
    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {"doc_id": 10, "url": "https://site.org/a#frag", "html": HTML_A},
            {"doc_id": 11, "url": "https://site.org/c", "html": HTML_C},
        ],
    )
    _run(spark, inbox, wh, ckpt)

    pages = {r.doc_id: r for r in wh.read("crawl_pages").collect()}
    assert pages[10].drop_reason == R_URL_DUP
    assert pages[10].url_canon == "https://site.org/a"
    assert pages[11].drop_reason is None
    idx = {(r.url_canon, r.doc_id) for r in wh.read("url_index").collect()}
    assert ("https://site.org/c", 11) in idx
    assert not any(d == 10 for _, d in idx)  # dup never enters the index

    # drained inbox: a third pass is a no-op
    n_pages = wh.read("crawl_pages").count()
    _run(spark, inbox, wh, ckpt)
    assert wh.read("crawl_pages").count() == n_pages


def test_crawl_stream_replay_is_idempotent(spark, tmp_path):
    """Dropping the marker (simulated crash before the marker write)
    and replaying the batch must rewrite, not duplicate."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _write_jsonl(
        inbox / "b1.jsonl",
        [{"doc_id": 1, "url": "https://site.org/a", "html": HTML_A}],
    )
    _run(spark, inbox, wh, tmp_path / "ck1")
    wh.drop("crawl_pages__applied_batches")  # lose the fast-skip marker
    # fresh checkpoint: the same file replays as batch 0 again
    _run(spark, inbox, wh, tmp_path / "ck2")
    pages = wh.read("crawl_pages").collect()
    assert len(pages) == 1 and pages[0].doc_id == 1
    # the replay must NOT match the batch against its own half-written
    # index rows (the keeper would corrupt into url_dup)
    assert pages[0].drop_reason is None
    assert wh.read("url_index").count() == 1


def test_crawl_cli_subprocess(tmp_path):
    """The cron-shaped crawl CLI: two invocations over a growing inbox
    behave as two increments, with a domain blocklist file."""
    import subprocess
    import sys

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh_dir = str(tmp_path / "wh")
    bl = tmp_path / "block.txt"
    bl.write_text("bad.net\n\n")
    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "url": "https://site.org/a", "html": HTML_A},
            {"doc_id": 2, "url": "https://x.bad.net/y", "html": HTML_B},
        ],
    )

    def run():
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "etl_sber_spark.crawl_cli",
                "--inbox",
                str(inbox),
                "--warehouse",
                wh_dir,
                "--blocklist",
                str(bl),
            ],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    r1 = run()
    assert r1["pages_total"] == 2 and r1["kept_total"] == 1
    assert r1["dropped"] == {"blocked_domain": 1}
    assert r1["url_index_size"] == 1

    _write_jsonl(
        inbox / "b2.jsonl",
        [{"doc_id": 3, "url": "https://www.site.org/a/", "html": HTML_A}],
    )
    r2 = run()  # URL-variant refetch dedupes against the index
    assert r2["pages_total"] == 3 and r2["kept_total"] == 1
    assert r2["dropped"]["url_dup"] == 1
    assert r2["url_index_size"] == 1


def test_crawl_stream_accumulates_host_edges(spark, tmp_path):
    """host_edges_table= grows the host link graph per batch (raw
    pages — a dropped page's outbound links still endorse), and the
    accumulated distinct graph feeds pagerank."""
    from etl_sber_spark.operators.pagerank import pagerank

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"

    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "url": "https://site.org/a",
             "html": '<p>enough words here</p>'
                     '<a href="https://hub.example/x">hub</a>'},
            {"doc_id": 2, "url": "https://other.net/b",
             "html": '<a href="http://hub.example/y">hub</a>'
                     '<a href="https://site.org/a">site</a>'},
        ],
    )
    _run(spark, inbox, wh, ckpt, host_edges_table="host_edges")

    got = {(r.src, r.dst) for r in wh.read("host_edges").collect()}
    assert got == {
        ("site.org", "hub.example"),
        ("other.net", "hub.example"),
        ("other.net", "site.org"),
    }

    # batch 2: a refetch of page 1's URL (url_dup) still contributes
    # its links; one new host appears
    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {"doc_id": 11, "url": "https://site.org/a/",
             "html": '<a href="https://hub.example/x">hub again</a>'},
            {"doc_id": 12, "url": "https://fresh.io/c",
             "html": '<a href="https://hub.example/z">hub</a>'},
        ],
    )
    _run(spark, inbox, wh, ckpt, host_edges_table="host_edges")

    edges = wh.read("host_edges").select("src", "dst")
    got = {(r.src, r.dst) for r in edges.collect()}
    assert ("fresh.io", "hub.example") in got
    # the re-observed (site.org, hub.example) edge appears in BOTH
    # batch partitions — pagerank input needs the documented distinct()
    assert edges.count() == 5
    ranks = pagerank(edges.distinct(), n_iter=5)
    top = ranks.orderBy(F.col("rank_u").desc()).first()
    assert top.node == "hub.example"


def test_url_dup_probe_plan_and_values(spark, tmp_path):
    """The cross-batch url-dedup probe (r10): the index side must be
    SCAN-ONLY — no Exchange between the index scan and the semi-join
    (an index-proportional shuffle per trigger is the 100 TB
    anti-shape) — and the probe's values must mark exactly the batch
    urls the index holds."""
    from etl_sber_spark.streaming.crawl import url_dup_probe

    index = spark.range(10_000).selectExpr(
        "concat('https://h/', id) AS url_canon", "id AS doc_id"
    )
    # duplicate index rows must not multiply the caller's left join
    index = index.union(index.limit(5))
    batch = spark.createDataFrame(
        [("https://h/7",), ("https://h/8",), ("https://new/1",)],
        "url_canon string",
    )
    probe = url_dup_probe(index, batch)
    rows = sorted(r.url_canon for r in probe.collect())
    assert rows == ["https://h/7", "https://h/8"]
    assert probe.collect()[0]._in_index is True

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the only Exchanges allowed are the broadcast of the batch urls
    # and the batch-bounded distinct AFTER the semi-join — never a
    # shuffle of the index before it. The index subtree in the string
    # is everything under the semi-join's streamed side: assert no
    # ShuffleExchange feeds the BroadcastHashJoin's left input by
    # checking the segment between the join node and its scan.
    join_at = plan.index("BroadcastHashJoin")
    scan_at = plan.index("Scan ExistingRDD", join_at)
    assert "Exchange hashpartitioning" not in plan[join_at:scan_at]
