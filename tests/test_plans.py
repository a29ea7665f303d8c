"""Plan-shape regression guards (SCALE.md): the physical properties the
100 TB story depends on, asserted so a future edit can't silently lose
them. Each assertion mirrors a measured .explain audit from round 2."""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_sber_spark.plans.queries import QUERIES

from .conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree_of(plan: str) -> str:
    """The operator-tree section only — 'formatted' repeats every
    operator name again in the per-node details below it."""
    return plan.split("\n\n")[0]


def test_scan_filter_pushdown(spark):
    p = plan_of(spark, "q_scan_filter")
    assert "PushedFilters:" in p
    # every predicate reaches the parquet reader
    assert "l_shipdate" in p.split("PushedFilters:")[1].splitlines()[0]
    assert "EqualTo(l_discount,0.05)" in p
    assert "LessThan(l_quantity,10" in p


def test_flagship_broadcasts_all_dims(spark):
    p = plan_of(spark, "q_flagship_revenue")
    assert tree_of(p).count("BroadcastHashJoin") == 4
    # lineitem scan pruned to the 3 needed columns
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in p


def test_topk_uses_group_limit_before_exchange(spark):
    p = plan_of(spark, "q_topk")
    assert "WindowGroupLimit" in p
    # two-phase: a local limit exists below the first Exchange
    first_exchange = p.index("Exchange")
    assert "WindowGroupLimit" in p[first_exchange:]


def test_lsh_candidates_no_subtree_replication(spark):
    """The posexplode/cache restructure holds: the documents scan must
    not be replicated per band/join side (was 8 DISTINCT scan nodes
    before the fix). Distinct node ids, not textual occurrences — once
    the cache is materialized the tree inlines the same cached subtree
    (same node id) under every InMemoryTableScan reference."""
    import re

    p = tree_of(plan_of(spark, "q_lsh_candidates"))
    scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", p))
    assert len(scan_ids) <= 3, f"distinct parquet scans: {scan_ids}"


def test_band_window_single_shuffle(spark):
    p = plan_of(spark, "q_band_window")
    assert tree_of(p).count("Exchange") == 1  # one shuffle on user_id
