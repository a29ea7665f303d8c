"""Mixture builder (operators/mixture.py): budget arithmetic, epoch
fan-out, and a DuckDB differential on the full membership/multiplicity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.mixture import (
    SourcePlan,
    build_mixture,
    mixture_plan,
    source_token_stats,
)
from etl_sber_spark.operators.sampling import RESOLUTION
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL
from .diffcheck import compare, duck_connect

_HASH = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 15)) AS BIGINT)"

# fixed recipe: one down-sampled source, one ~1.5-epoch source, one
# multi-epoch source, everything else excluded
_PLAN = {
    "src0": SourcePlan(epochs=0, frac_threshold=4000),  # keep ~40%
    "src1": SourcePlan(epochs=1, frac_threshold=5000),  # ~1.5 epochs
    "src2": SourcePlan(epochs=3, frac_threshold=0),  # exactly 3 epochs
}

_ORACLE = f"""
WITH base AS (
    SELECT doc_id, source,
           ({_HASH}) % {RESOLUTION} AS bucket,
           CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 1
                       WHEN 'src2' THEN 3 ELSE 0 END AS epochs,
           CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 5000
                       WHEN 'src2' THEN 0 ELSE 0 END AS thr
    FROM documents
),
planned AS (
    SELECT doc_id, source,
           epochs + CASE WHEN bucket < thr THEN 1 ELSE 0 END AS n_copies
    FROM base
)
SELECT doc_id, source, CAST(unnest(range(0, n_copies)) AS BIGINT) AS epoch
FROM planned
WHERE n_copies > 0
"""


def test_build_mixture_matches_duckdb(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    out = build_mixture(d, _PLAN).select(
        "doc_id", "source", F.col("epoch").cast("long").alias("epoch")
    )
    duck = duck_connect(SF_SMALL)
    try:
        compare("mixture", out, duck, _ORACLE)
    finally:
        duck.close()


def test_epoch_ordinals_complete(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    out = build_mixture(d, _PLAN)
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("epoch").alias("lo"),
            F.max("epoch").alias("hi"),
            F.count_distinct("epoch").alias("n_distinct"),
        )
        .filter(
            (F.col("lo") != 0)
            | (F.col("hi") != F.col("n") - 1)
            | (F.col("n_distinct") != F.col("n"))
        )
    )
    assert per_doc.count() == 0  # copies are exactly epochs 0..n-1


def test_mixture_plan_arithmetic():
    stats = {"a": 1000, "b": 4000}
    # budget 6000, weights 2:1 -> a gets 4000 (4 epochs), b gets 2000 (rate .5)
    plan = mixture_plan(stats, {"a": 2.0, "b": 1.0}, 6000)
    assert plan["a"] == SourcePlan(4, 0)
    assert plan["b"] == SourcePlan(0, RESOLUTION // 2)
    assert plan["a"].repeat_factor == 4.0

    with pytest.raises(ValueError, match="no tokens"):
        mixture_plan(stats, {"missing": 1.0}, 100)
    with pytest.raises(ValueError, match="max_epochs"):
        mixture_plan({"a": 10}, {"a": 1.0}, 10_000_000)
    with pytest.raises(ValueError, match="positive"):
        mixture_plan(stats, {}, 100)


def test_end_to_end_budget_hit(spark):
    """Composed flow: measured stats -> plan -> mixture. The emitted
    token total per source lands within the hash-quantization tolerance
    of its target share."""
    d = load_table(spark, SF_SMALL, "documents").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    stats_rows = source_token_stats(
        d, token_count=F.col("n_tokens")
    ).collect()
    stats = {r["source"]: r["n_tokens"] for r in stats_rows}
    weights = {"src0": 3.0, "src1": 1.0}
    budget = 6000
    plan = mixture_plan(stats, weights, budget)
    out = build_mixture(d, plan)
    emitted = {
        r["source"]: r["tok"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert set(emitted) == {"src0", "src1"}
    for src, w in weights.items():
        target = budget * w / sum(weights.values())
        # fractional epoch is hash-Bernoulli over ~25 docs; allow a few
        # average-sized documents of slack
        assert abs(emitted[src] - target) < 0.2 * target, (src, emitted[src], target)


def test_mixture_deterministic(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    a = build_mixture(d, _PLAN).orderBy("doc_id", "epoch").collect()
    b = build_mixture(d, _PLAN).orderBy("doc_id", "epoch").collect()
    assert a == b


def test_mixture_plan_properties():
    """Arithmetic invariants, fuzzed: targets respect weights, the
    repeat factor reconstructs the target within hash quantization,
    and planning is scale-free in the budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    weights_st = st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(6)]),
        st.floats(min_value=0.01, max_value=10, allow_nan=False),
        min_size=1,
        max_size=6,
    )
    stats_st = st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(6)]),
        st.integers(min_value=1, max_value=10**9),
        min_size=6,
        max_size=6,
    )

    @given(weights=weights_st, stats=stats_st, budget=st.integers(10**3, 10**9))
    @settings(max_examples=200, deadline=None)
    def check(weights, stats, budget):
        try:
            plan = mixture_plan(stats, weights, budget)
        except ValueError:
            return  # max_epochs guard is allowed to fire
        total_w = sum(weights.values())
        for src, sp in plan.items():
            target = budget * weights[src] / total_w
            # repeat_factor * available reconstructs the target within
            # the 1/RESOLUTION quantization of the fractional epoch
            got = sp.repeat_factor * stats[src]
            assert abs(got - target) <= stats[src] / RESOLUTION + 1e-6
            assert 0 <= sp.frac_threshold < RESOLUTION

    check()


def test_temperature_weights_limits_and_laws():
    from etl_sber_spark.operators.mixture import temperature_weights

    stats = {"web": 8_000_000, "code": 1_500_000, "wiki": 500_000}
    # T=1: natural proportions
    w1 = temperature_weights(stats, 1.0)
    assert w1["web"] == pytest.approx(0.8)
    assert w1["wiki"] == pytest.approx(0.05)
    # higher T flattens: small sources gain, big ones lose
    w3 = temperature_weights(stats, 3.0)
    assert w3["wiki"] > w1["wiki"] and w3["web"] < w1["web"]
    # T -> large approaches uniform
    w100 = temperature_weights(stats, 100.0)
    assert max(w100.values()) - min(w100.values()) < 0.02
    # always a distribution
    for w in (w1, w3, w100):
        assert sum(w.values()) == pytest.approx(1.0)
    # zero-token sources are excluded, invalid T rejected
    assert "empty" not in temperature_weights({**stats, "empty": 0}, 2.0)
    with pytest.raises(ValueError):
        temperature_weights(stats, 0.0)


def test_temperature_weights_chain_into_plan():
    from etl_sber_spark.operators.mixture import (
        mixture_plan,
        temperature_weights,
    )

    stats = {"web": 1_000_000, "wiki": 10_000}
    plan = mixture_plan(
        stats, temperature_weights(stats, 5.0), budget_tokens=500_000
    )
    # flattened weights upsample wiki far above its natural share
    assert plan["wiki"].repeat_factor > 5
    assert plan["web"].repeat_factor < 1
