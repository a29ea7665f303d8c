"""Crawl preprocessing (operators/crawl.py): gate precedence, URL-dup
survivors, list modes, and chaining into curate_corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sber_spark.operators.crawl import (
    R_BAD_URL,
    R_BLOCKED,
    R_EMPTY,
    R_NOT_ALLOWED,
    R_URL_DUP,
    preprocess_crawl,
)
from etl_sber_spark.operators.curate import curate_corpus

PAGE = "<html><body><p>a perfectly ordinary page with enough words here</p></body></html>"


def _pages(spark):
    rows = [
        (1, "https://www.site.org/a/?utm_source=x", PAGE),
        (2, "https://site.org/a", PAGE),  # same canon as 1 -> dup
        (3, "https://site.org/b", "<p></p>"),  # empty after extraction
        (4, "not a url", PAGE),
        (5, "https://ads.bad.net/x", PAGE),
        (6, "https://other.org/c", PAGE),
    ]
    return spark.createDataFrame(rows, "doc_id int, url string, html string")


def test_gates_and_url_dedup(spark):
    bl = spark.createDataFrame([("bad.net",)], "domain string")
    out = {
        r.doc_id: r
        for r in preprocess_crawl(_pages(spark), blocklist=bl).collect()
    }
    assert len(out) == 6  # one row in, one row out
    assert out[1].drop_reason is None
    assert out[1].url_canon == "https://site.org/a"
    assert "ordinary page" in out[1].text and "<p>" not in out[1].text
    # doc 2 canonicalizes to the same URL; min-id 1 survives
    assert out[2].drop_reason == R_URL_DUP
    assert out[3].drop_reason == R_EMPTY
    assert out[4].drop_reason == R_BAD_URL and out[4].url_canon is None
    assert out[5].drop_reason == R_BLOCKED
    assert out[6].drop_reason is None


def test_allowlist_mode_and_precedence(spark):
    al = spark.createDataFrame([("site.org",)], "domain string")
    bl = spark.createDataFrame([("site.org",)], "domain string")
    out = {
        r.doc_id: r
        for r in preprocess_crawl(_pages(spark), allowlist=al).collect()
    }
    assert out[1].drop_reason is None
    assert out[6].drop_reason == R_NOT_ALLOWED
    assert out[4].drop_reason == R_BAD_URL  # bad_url precedes list gates
    # blocklist wins over allowlist when both name the domain
    both = {
        r.doc_id: r
        for r in preprocess_crawl(
            _pages(spark), blocklist=bl, allowlist=al
        ).collect()
    }
    assert both[1].drop_reason == R_BLOCKED


def test_chains_into_curate(spark):
    """The composed path: crawl gates -> curate text gates, one
    annotated frame each, keepers flow through."""
    bl = spark.createDataFrame([("bad.net",)], "domain string")
    docs = (
        preprocess_crawl(_pages(spark), blocklist=bl)
        .filter(F.col("drop_reason").isNull())
        .select("doc_id", F.col("url_canon").alias("url"), "text")
    )
    curated = curate_corpus(docs, allowed_langs=("en",), min_tokens=3)
    rows = {r.doc_id: r for r in curated.collect()}
    assert set(rows) == {1, 6}
    # identical extracted text -> one survives curate's exact dedup
    reasons = sorted(str(r.drop_reason) for r in rows.values())
    assert reasons == ["None", "exact_dup"]


def test_plan_no_pair_product(spark):
    import contextlib, io

    bl = spark.createDataFrame([("bad.net",)], "domain string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        preprocess_crawl(_pages(spark), blocklist=bl).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_null_html_never_survives(spark):
    """A NULL html (fetch failure) must drop as empty_text — and must
    NOT out-rank the real fetch of the same URL in min-id dedup."""
    rows = [
        (1, "https://site.org/a", None),
        (2, "https://www.site.org/a/?utm_source=x", PAGE),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, html string")
    out = {r.doc_id: r for r in preprocess_crawl(df).collect()}
    assert out[1].drop_reason == R_EMPTY
    assert out[2].drop_reason is None  # the real fetch survives


def test_reserved_output_columns_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "https://site.org/a", PAGE, "x")],
        "doc_id int, url string, html string, text string",
    )
    with pytest.raises(ValueError, match="text"):
        preprocess_crawl(df)


def test_noindex_gate(spark):
    from etl_sber_spark.operators.crawl import R_NOINDEX

    rows = [
        (1, "https://site.org/a", f'<meta name="robots" content="noindex">{PAGE}'),
        (2, "https://site.org/b", PAGE),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, html string")
    out = {r.doc_id: r for r in preprocess_crawl(df).collect()}
    assert out[1].drop_reason == R_NOINDEX
    assert out[2].drop_reason is None
    # the directive is advisory: respect_noindex=False keeps the page
    out2 = {
        r.doc_id: r
        for r in preprocess_crawl(df, respect_noindex=False).collect()
    }
    assert out2[1].drop_reason is None
