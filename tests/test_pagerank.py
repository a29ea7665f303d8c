"""PageRank (operators/pagerank.py): exact pure-Python differential of
the full quantized trajectory, conservation/determinism laws, link
extraction, and the host-graph integration."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.functions.web import extract_links
from etl_sber_spark.operators.pagerank import (
    UNIT,
    host_link_edges,
    pagerank,
)


def _half_up(x: Decimal) -> int:
    return int(x.quantize(Decimal(1), rounding=ROUND_HALF_UP))


def py_pagerank(edges, damping=0.85, n_iter=10):
    """The operator's exact arithmetic, replayed in plain Python:
    integer rank units, IEEE per-row ops, exact integer sums."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    deg = Counter(s for s, _ in edges)
    d = Decimal(str(damping))
    ru = {v: _half_up(Decimal(UNIT) / n) for v in nodes}
    base = _half_up((Decimal(1) - d) * UNIT / n)
    for _ in range(n_iter):
        dangling = sum(ru[v] for v in nodes if v not in deg)
        share = _half_up(d * dangling / n)
        per_src = {s: math.floor(ru[s] / deg[s] + 0.5) for s in deg}
        contrib = defaultdict(int)
        for s, t in edges:
            contrib[t] += per_src[s]
        ru = {
            v: base
            + share
            + math.floor(float(damping) * contrib.get(v, 0) + 0.5)
            for v in nodes
        }
    return ru


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "e"),  # e is dangling (no out-edges)
    ("f", "c"),              # f has no in-edges
]


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_two_node_cycle_is_uniform(spark):
    got = {r.node: r.rank_u for r in pagerank(
        _edges(spark, [("a", "b"), ("b", "a")]), n_iter=5
    ).collect()}
    assert got["a"] == got["b"]
    assert abs(got["a"] - UNIT // 2) <= 1


def test_exact_python_differential(spark):
    want = py_pagerank(GRAPH)
    got = {r.node: r.rank_u for r in pagerank(_edges(spark, GRAPH)).collect()}
    assert got == want
    # and the hub (c: 4 in-links) outranks everything; the never-linked
    # sources d and f tie at the floor rank
    assert max(got, key=got.get) == "c"
    floor = min(got.values())
    assert {v for v, u in got.items() if u == floor} == {"d", "f"}


def test_rank_conservation(spark):
    got = pagerank(_edges(spark, GRAPH)).agg(F.sum("rank_u")).collect()[0][0]
    n = len({s for s, _ in GRAPH} | {t for _, t in GRAPH})
    # per-node quantization is ±0.5 unit per term; the dangling fold
    # adds one more — total drift bounded by a few units per node
    assert abs(got - UNIT) <= 4 * n


def test_deterministic_across_partitionings(spark):
    e = _edges(spark, GRAPH)
    a = {r.node: r.rank_u for r in pagerank(e).collect()}
    b = {r.node: r.rank_u for r in pagerank(e.repartition(13)).collect()}
    assert a == b


def test_validation_and_empty(spark):
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(_edges(spark, GRAPH), n_iter=0)
    assert pagerank(_edges(spark, [])).collect() == []


def test_extract_links_cases(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                '<a href="http://x.com/a">x</a>'
                "<A HREF='https://y.com/b'>y</A>"
                '<a class="z" href="/rel" title="a > b">rel</a>'
                '<a name="anchor-only">n</a>'
                '<a href="">empty</a>'
                "<a href=bare.html>bare</a>",
            ),
            (2, None),
        ],
        "id long, html string",
    )
    got = {r.id: r.links for r in df.select(
        "id", extract_links("html").alias("links")
    ).collect()}
    assert got[1] == ["http://x.com/a", "https://y.com/b", "/rel", "bare.html"]
    assert got[2] == []


def test_host_link_edges(spark):
    pages = spark.createDataFrame(
        [
            # self-link and relative links drop; www. strips; dup edge
            # from a second page of the same host collapses
            ("http://www.blog.example/post1",
             '<a href="https://hub.example/x">h</a>'
             '<a href="http://blog.example/other">self</a>'
             '<a href="/relative">r</a>'),
            ("http://blog.example/post2",
             '<a href="https://hub.example/y">h again</a>'),
            ("http://news.example/a",
             '<a href="http://hub.example/z">h</a>'
             '<a href="http://blog.example/p">b</a>'),
            ("not a url", '<a href="http://hub.example/q">ignored</a>'),
        ],
        "url string, html string",
    )
    got = {(r.src, r.dst) for r in host_link_edges(pages).collect()}
    assert got == {
        ("blog.example", "hub.example"),
        ("news.example", "hub.example"),
        ("news.example", "blog.example"),
    }


def test_host_graph_integration(spark):
    """End-to-end: crawled pages -> host edges -> pagerank; the
    everywhere-linked hub must take the top rank."""
    pages = spark.createDataFrame(
        [
            (f"http://site{i}.example/p",
             '<a href="http://hub.example/x">hub</a>'
             + (f'<a href="http://site{i + 1}.example/q">next</a>'
                if i < 4 else ""))
            for i in range(5)
        ],
        "url string, html string",
    )
    ranks = pagerank(host_link_edges(pages), n_iter=8)
    top = ranks.orderBy(F.col("rank_u").desc()).first()
    assert top.node == "hub.example"
    assert 0 < top.rank < 1


def test_null_edges_dropped_not_rank_sinks(spark):
    """Review regression: a NULL endpoint must not become a rank row
    whose mass silently vanishes from the total."""
    e = spark.createDataFrame(
        [("a", None), ("a", "b"), ("b", "a"), (None, "a")],
        "src string, dst string",
    )
    got = {r.node: r.rank_u for r in pagerank(e, n_iter=5).collect()}
    assert set(got) == {"a", "b"}
    assert abs(sum(got.values()) - UNIT) <= 4 * 2


def test_extract_links_attribute_hygiene(spark):
    """Review regression: href= inside another attribute's NAME
    (data-href, xlink:href) or quoted VALUE must neither supply nor
    displace the real link; commented-out and scripted anchors are not
    rendered and produce nothing."""
    df = spark.createDataFrame(
        [
            (1, '<a data-href="/tracking" href="http://real.com/">x</a>'),
            (2, '<a title="see href=evil" href="http://real2.com/">y</a>'),
            (3, '<a xlink:href="/svg" href="http://real3.com/">z</a>'),
            (4, '<!-- <a href="http://retired.example/">old</a> -->'
                '<script>var a = \'<a href="http://tpl.example/">t</a>\';'
                "</script>"
                '<a href="http://live.example/">live</a>'),
            (5, '<a hreflang="en" href="http://real5.com/">h</a>'),
            (6, '<a HREF="http://upper.com/">u</a>'),
        ],
        "id long, html string",
    )
    got = {r.id: r.links for r in df.select(
        "id", extract_links("html").alias("links")
    ).collect()}
    assert got[1] == ["http://real.com/"]
    assert got[2] == ["http://real2.com/"]
    assert got[3] == ["http://real3.com/"]
    assert got[4] == ["http://live.example/"]
    assert got[5] == ["http://real5.com/"]
    assert got[6] == ["http://upper.com/"]


def test_protocol_relative_links_carry_endorsement(spark):
    """Review regression: //cdn.example/x targets a DIFFERENT host —
    the edge must exist (resolved as http; the host is scheme-free)."""
    pages = spark.createDataFrame(
        [("http://blog.example/p", '<a href="//cdn.example/lib">c</a>')],
        "url string, html string",
    )
    got = {(r.src, r.dst) for r in host_link_edges(pages).collect()}
    assert got == {("blog.example", "cdn.example")}


def py_pagerank_seeded(edges, seeds, damping=0.85, n_iter=10):
    """Seeded (personalized) replay: teleport + dangling mass go only
    to seed nodes — the operator's exact arithmetic."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    deg = Counter(s for s, _ in edges)
    seed_set = set(seeds) & set(nodes)
    d = Decimal(str(damping))
    n, n_tele = len(nodes), len(seed_set)
    ru = {v: _half_up(Decimal(UNIT) / n) for v in nodes}
    base = _half_up((Decimal(1) - d) * UNIT / n_tele)
    for _ in range(n_iter):
        dangling = sum(ru[v] for v in nodes if v not in deg)
        share = _half_up(d * dangling / n_tele)
        per_src = {s: math.floor(ru[s] / deg[s] + 0.5) for s in deg}
        contrib = defaultdict(int)
        for s, t in edges:
            contrib[t] += per_src[s]
        ru = {
            v: (base + share if v in seed_set else 0)
            + math.floor(float(damping) * contrib.get(v, 0) + 0.5)
            for v in nodes
        }
    return ru


def test_seeded_pagerank_differential_and_trust_decay(spark):
    seeds = spark.createDataFrame([("a",)], "host string")
    want = py_pagerank_seeded(GRAPH, {"a"})
    got = {r.node: r.rank_u for r in pagerank(
        _edges(spark, GRAPH), seeds=seeds
    ).collect()}
    assert got == want
    # trust propagates FROM a only: a -> {b, c} -> a is the reachable
    # core; d/f (unreached, unseeded) decay to zero teleport + zero
    # contributions
    assert got["d"] == 0 and got["f"] == 0
    assert got["a"] > got["c"] > 0 and got["b"] > 0
    # e is only fed by unreached d -> decays to 0 as well
    assert got["e"] == 0


def test_all_nodes_as_seeds_equals_unseeded(spark):
    e = _edges(spark, GRAPH)
    all_nodes = spark.createDataFrame(
        [(v,) for v in sorted({s for s, _ in GRAPH} | {t for _, t in GRAPH})],
        "host string",
    )
    a = {r.node: r.rank_u for r in pagerank(e).collect()}
    b = {r.node: r.rank_u for r in pagerank(e, seeds=all_nodes).collect()}
    assert a == b


def test_seeds_disjoint_from_graph_raise(spark):
    with pytest.raises(ValueError, match="none of the seed nodes"):
        pagerank(
            _edges(spark, GRAPH),
            seeds=spark.createDataFrame([("zzz",)], "host string"),
        )
