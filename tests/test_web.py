"""Web preprocessing (functions/web.py): HTML-to-text fixtures, URL
canonicalization cases, suffix-chain domain gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.functions.web import (
    domain_gate,
    host_suffixes,
    html_to_text,
    normalize_url,
)


def _one(spark, expr, value):
    return (
        spark.createDataFrame([(value,)], "v string")
        .select(expr.alias("r"))
        .collect()[0]
        .r
    )


HTML_CASES = [
    # scripts/styles/comments vanish wholesale
    (
        "<p>keep</p><script>var x = '<p>no</p>';</script><style>p{color:red}</style><!-- gone -->tail",
        "keep\ntail",
    ),
    # block tags break lines (never stacking), inline tags just drop
    (
        "<h1>Title</h1><p>One <b>bold</b> word.</p><ul><li>a</li><li>b</li></ul>",
        "Title\nOne bold word.\na\nb",
    ),
    # entities, incl. the &amp;lt; double-decode trap
    (
        "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;",
        'a & b <tag> "q" \'s\' end &lt;',
    ),
    # quoted attributes holding '>' don't break tag matching; CRLF runs
    (
        '<div class="x" data-y=\'<z>\'>A</div>\r\n\r\n\r\n   B<br/>C',
        "A\nB\nC",
    ),
    # malformed nesting degrades to whitespace, never errors
    ("<p>un<closed <b>ok</b>", "un ok"),
    # case-insensitive script close
    ("<SCRIPT>x</SCRIPT>after", "after"),
    ("plain text stays", "plain text stays"),
]


@pytest.mark.parametrize("raw,want", HTML_CASES)
def test_html_to_text(spark, raw, want):
    assert _one(spark, html_to_text(F.col("v")), raw) == want


URL_CASES = [
    # scheme/host lowercase, www and fragment stripped
    ("HTTPS://WWW.Example.COM/Path#frag", "https://example.com/Path"),
    # default ports drop, explicit ports stay
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # tracking params out, survivors sorted, trailing slash trimmed
    (
        "https://example.com/p/?utm_source=x&b=2&a=1&fbclid=abc",
        "https://example.com/p?a=1&b=2",
    ),
    ("https://example.com/?utm_campaign=x", "https://example.com"),
    # a real param named like a prefix of a tracker survives
    ("https://example.com/?utming=1", "https://example.com?utming=1"),
    # bare ref is a tracker even valueless
    ("https://example.com/?ref", "https://example.com"),
    ("ftp://example.com/a", None),
    ("not a url", None),
    (None, None),
]


@pytest.mark.parametrize("raw,want", URL_CASES)
def test_normalize_url(spark, raw, want):
    assert _one(spark, normalize_url(F.col("v")), raw) == want


def test_normalize_url_is_a_dedup_key(spark):
    variants = [
        "https://WWW.site.org/news/?id=3&utm_medium=mail",
        "https://site.org/news?utm_source=a&id=3",
        "https://site.org:443/news/?id=3#top",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "v string")
    keys = df.select(normalize_url("v").alias("k")).distinct().collect()
    assert len(keys) == 1 and keys[0].k == "https://site.org/news?id=3"


def test_host_suffixes(spark):
    got = _one(spark, host_suffixes(F.col("v")), "a.b.example.com")
    assert got == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert _one(spark, host_suffixes(F.col("v")), "localhost") == ["localhost"]


def test_domain_gate_block_and_allow(spark):
    rows = [
        (1, "https://ads.tracker.net/x"),
        (2, "https://sub.deep.tracker.net/y"),
        (3, "https://news.site.org/a"),
        (4, "https://tracker.net.evil.org/z"),  # suffix, NOT subdomain
        (5, "not a url"),
        (3, "https://news.site.org/a"),  # duplicate row: multiplicity
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    bl = spark.createDataFrame([("Tracker.NET",)], "domain string")

    blocked = domain_gate(df, bl, mode="block")
    assert sorted(r.id for r in blocked.collect()) == [3, 3, 4, 5]

    allowed = domain_gate(df, bl, mode="allow")
    assert sorted(r.id for r in allowed.collect()) == [1, 2]

    # allowlist mode: unparseable URLs drop; subdomains of an allowed
    # domain pass; lookalike suffix domains do not
    al = spark.createDataFrame([("site.org",)], "domain string")
    kept = domain_gate(df, al, mode="allow")
    assert sorted(r.id for r in kept.collect()) == [3, 3]

    with pytest.raises(ValueError, match="mode"):
        domain_gate(df, bl, mode="deny")


def test_domain_gate_plan_is_equi_joins(spark):
    import contextlib, io

    df = spark.createDataFrame(
        [(1, "https://a.example.com/x")], "id int, url string"
    )
    bl = spark.createDataFrame([("example.com",)], "domain string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        domain_gate(df, bl, mode="block").explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


NOINDEX_CASES = [
    ('<meta name="robots" content="noindex, nofollow">', True),
    ("<META CONTENT='NOINDEX' NAME='ROBOTS'>", True),  # order + case
    ('<meta name="googlebot" content="noindex">', True),
    ('<meta name="robots" content="nofollow">', False),
    ('<meta name="description" content="noindex tips">', False),
    ("the word noindex in body text", False),
    ("<p>no meta at all</p>", False),
    (None, False),
]


@pytest.mark.parametrize("raw,want", NOINDEX_CASES)
def test_has_noindex(spark, raw, want):
    from etl_sber_spark.functions.web import has_noindex

    assert _one(spark, has_noindex(F.col("v")), raw) == want


NOINDEX_EDGE_CASES = [
    # noindex in a LATER attribute, not in content= -> must not flag
    ('<meta name="robots" content="all" data-note="noindex">', False),
    # '>' inside the quoted content value must not truncate the tag
    ('<meta content="a > b, noindex" name="robots">', True),
    # unquoted content value
    ("<meta name=robots content=noindex>", True),
]


@pytest.mark.parametrize("raw,want", NOINDEX_EDGE_CASES)
def test_has_noindex_edges(spark, raw, want):
    from etl_sber_spark.functions.web import has_noindex

    assert _one(spark, has_noindex(F.col("v")), raw) == want


def test_normalize_url_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) over a component grid —
    canonical forms must be fixed points, or dedup keys drift when a
    pipeline canonicalizes twice."""
    import itertools

    urls = [
        f"{s}://{h}{p}{path}{q}{f}"
        for s, h, p, path, q, f in itertools.product(
            ["https", "HTTP"],
            ["www.Site.org", "a.b.example.com", "localhost"],
            ["", ":443", ":80", ":8080"],
            ["", "/", "/x/y/", "/x%20y"],
            ["", "?b=2&a=1", "?utm_source=t&a=1", "?ref"],
            ["", "#frag"],
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "v string")
    once = df.select(normalize_url("v").alias("c")).filter(
        F.col("c").isNotNull()
    )
    twice = once.select(
        F.col("c"), normalize_url("c").alias("c2")
    ).collect()
    assert len(twice) > 100  # the grid really produced parseable URLs
    for r in twice:
        assert r.c2 == r.c, (r.c, r.c2)


def test_stacked_www_strips_in_one_pass(spark):
    got = _one(spark, normalize_url(F.col("v")), "https://www.www.example.com/x")
    assert got == "https://example.com/x"


def test_noindex_attr_names_anchor_not_word_boundary(spark):
    """data-name=/data-content= must not satisfy the name=/content=
    probes: '-' is a non-word character, so the old \\b anchors matched
    INSIDE those attribute names and a page like
    <meta data-name="robots" data-content="noindex-note" content="all">
    was silently dropped though the publisher never opted out (r8
    review)."""
    from pyspark.sql import functions as F

    from etl_sber_spark.functions.web import has_noindex

    rows = [
        # data-name is not name=; no robots meta at all
        ('<meta data-name="robots" content="noindex">', False),
        # real name= but noindex only inside data-content
        ('<meta name="robots" data-content="noindex-note" content="all">',
         False),
        # the real directive still detects, any attr order/quoting
        ('<meta content="noindex" name=robots>', True),
        ("<meta name='googlebot' content='noindex, nofollow'>", True),
    ]
    df = spark.createDataFrame(
        [(i, h, want) for i, (h, want) in enumerate(rows)],
        "i int, html string, want boolean",
    )
    got = df.withColumn("got", has_noindex("html"))
    bad = got.filter(F.col("got") != F.col("want"))
    assert bad.count() == 0, [tuple(r) for r in bad.collect()]


def test_noindex_slash_separated_attributes(spark):
    """HTML5 parsers accept '/' as an attribute separator, so
    <meta name="robots"/content="noindex"> carries a real directive;
    the r8 [\\s"'] anchor class missed it (r8 advice: include '/')."""
    from pyspark.sql import functions as F

    from etl_sber_spark.functions.web import has_noindex

    rows = [
        ('<meta name="robots"/content="noindex">', True),
        ('<meta/name=robots content="noindex">', True),
        # the data-content guard must survive the wider anchor class
        ('<meta name="robots" content="all" data-content="noindex">',
         False),
    ]
    df = spark.createDataFrame(
        [(i, h, want) for i, (h, want) in enumerate(rows)],
        "i int, html string, want boolean",
    )
    got = df.withColumn("got", has_noindex("html"))
    bad = got.filter(F.col("got") != F.col("want"))
    assert bad.count() == 0, [tuple(r) for r in bad.collect()]
