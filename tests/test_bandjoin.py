"""operators/bandjoin.py: the window EXISTS rewrite of the J9 band
self-join (fraud rule 3's scale default since round 3, SURVEY §4.3.2).

Parity is asserted two ways: directly against the literal join on the
events table (every qualifying row, no more, no less), and at the
fraud-rule level on real replay data (tests/test_fraud_parity.py).
Plan shape is pinned so a future edit can't silently reintroduce the
pair product into the default path.
"""

from __future__ import annotations

import contextlib
import io

import datetime as dt

from pyspark.sql import functions as F

from etl_sber_spark.operators.bandjoin import (
    band_partner_groups,
    exists_band_partner,
)
from etl_sber_spark.plans.fraud import rule_city_hopping
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _events(spark):
    return load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_type", "ts"
    )


def _literal_band_groups(e):
    """The reference-literal shape: band self-join + DISTINCT."""
    t1 = e.alias("t1")
    t2 = e.alias("t2")
    return (
        t1.join(
            t2,
            (F.col("t1.user_id") == F.col("t2.user_id"))
            & (F.col("t1.event_type") != F.col("t2.event_type"))
            & (F.col("t1.ts") != F.col("t2.ts"))
            & F.col("t1.ts").between(
                F.col("t2.ts") - F.expr("INTERVAL 1 HOUR"),
                F.col("t2.ts") + F.expr("INTERVAL 1 HOUR"),
            ),
        )
        .select(
            F.col("t2.user_id").alias("user_id"),
            F.col("t2.event_type").alias("event_type"),
            F.col("t2.ts").alias("ts"),
        )
        .distinct()
    )


def test_groups_match_literal_join(spark):
    e = _events(spark)
    got = {
        (r.user_id, r.event_type, r.ts)
        for r in band_partner_groups(
            e, ["user_id"], "ts", "event_type"
        ).collect()
    }
    want = {
        (r.user_id, r.event_type, r.ts)
        for r in _literal_band_groups(e).collect()
    }
    assert len(want) > 0, "fixture produced no band pairs — test is vacuous"
    assert got == want


def test_exists_preserves_all_columns_and_duplicates(spark):
    """exists_band_partner semi-joins the ORIGINAL rows: extra columns
    survive, and a duplicated qualifying row stays duplicated (the
    dedup happens in group space only)."""
    e = _events(spark).withColumn("extra", F.lit("x"))
    doubled = e.unionAll(e)
    out = exists_band_partner(doubled, ["user_id"], "ts", "event_type")
    assert out.columns == ["user_id", "event_type", "ts", "extra"]
    n_single = exists_band_partner(
        e, ["user_id"], "ts", "event_type"
    ).count()
    assert n_single > 0
    assert out.count() == 2 * n_single


def test_null_rows_dropped_like_inner_join(spark):
    """A NULL key/ts/diff row can satisfy neither side of the join
    predicate — it must neither qualify nor act as a partner."""
    base = dt.datetime(2021, 3, 1, 12, 0)
    rows = [
        # u1: real partner pair (different city, 30 min apart)
        (1, "a", base),
        (1, "b", base + dt.timedelta(minutes=30)),
        # u2: only a NULL-city partner -> must NOT qualify
        (2, "a", base),
        (2, None, base + dt.timedelta(minutes=30)),
        # NULL key rows must not partner each other
        (None, "a", base),
        (None, "b", base + dt.timedelta(minutes=30)),
        # u3: only a same-ts different-city partner -> the literal join
        # requires ts <> ts, so u3 must NOT qualify
        (3, "a", base),
        (3, "b", base),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {
        (r.user_id, r.event_type)
        for r in band_partner_groups(
            df, ["user_id"], "ts", "event_type"
        ).collect()
    }
    assert got == {(1, "a"), (1, "b")}


def test_tolerance_boundary_is_inclusive_and_exact(spark):
    """BETWEEN is inclusive: exactly 1h apart qualifies; 1h + 1s does
    not (microsecond-exact range frame, not a seconds truncation)."""
    base = dt.datetime(2021, 3, 1, 12, 0)
    rows = [
        (1, "a", base),
        (1, "b", base + dt.timedelta(hours=1)),
        (2, "a", base),
        (2, "b", base + dt.timedelta(hours=1, seconds=1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    got = {
        r.user_id
        for r in band_partner_groups(
            df, ["user_id"], "ts", "event_type"
        ).collect()
    }
    assert got == {1}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("\n\n")[0]


def test_default_rule3_plan_has_no_band_selfjoin(spark):
    """The mart's default rule-3 plan must contain no join at all on a
    join-free view (windows only in group space, then one LeftSemi);
    faithful=True is the only way to get the literal band join back."""
    base = dt.datetime(2021, 3, 1, 12, 0)
    view = spark.createDataFrame(
        [
            ("c1", "Moscow", base, "p1", "A B", "111"),
            ("c1", "Kazan", base + dt.timedelta(minutes=10), "p1", "A B", "111"),
        ],
        "card_num string, terminal_city string, trans_date timestamp, "
        "passport_num string, name string, phone string",
    )
    default_plan = _plan(rule_city_hopping(view))
    joins = [
        ln for ln in default_plan.splitlines() if "Join" in ln
    ]
    assert all("LeftSemi" in ln for ln in joins), default_plan
    assert "BroadcastNestedLoopJoin" not in default_plan

    faithful_plan = _plan(rule_city_hopping(view, faithful=True))
    assert any(
        "Join" in ln and "LeftSemi" not in ln
        for ln in faithful_plan.splitlines()
    ), faithful_plan


def test_time_binned_matches_default(spark):
    """time_bins=True (the hot-key parallelism knob) must be
    row-identical to the default single-partition-per-key windows —
    on the real events table AND on planted bin-boundary cases."""
    e = _events(spark)
    base = sorted(
        map(
            tuple,
            band_partner_groups(
                e, ["user_id"], "ts", "event_type"
            ).collect(),
        )
    )
    binned = sorted(
        map(
            tuple,
            band_partner_groups(
                e, ["user_id"], "ts", "event_type", time_bins=True
            ).collect(),
        )
    )
    assert binned == base and base  # non-vacuous


def test_time_binned_boundary_cases(spark):
    """Planted adversaries for the binning algebra: partners exactly
    tolerance apart (inclusive band) landing in DIFFERENT bins,
    same-ts different-diff rows (excluded by ts<>), same-diff partners
    (excluded), and a lone row. Compared against the default windows
    AND a literal pair-join oracle."""
    rows = [
        # k1: a at t=3599s before bin edge, b at t+3600 (exact tol,
        # different bin) -> both qualify (inclusive band, diff differs)
        ("k1", dt.datetime(2021, 3, 1, 0, 59, 59), "X"),
        ("k1", dt.datetime(2021, 3, 1, 1, 59, 59), "Y"),
        # k2: same ts, different diff -> ts<> fails, neither qualifies
        ("k2", dt.datetime(2021, 3, 1, 2, 0, 0), "X"),
        ("k2", dt.datetime(2021, 3, 1, 2, 0, 0), "Y"),
        # k3: same diff 10 min apart -> diff<> fails
        ("k3", dt.datetime(2021, 3, 1, 3, 0, 0), "X"),
        ("k3", dt.datetime(2021, 3, 1, 3, 10, 0), "X"),
        # k4: 3601 s apart, different diff -> outside the band
        ("k4", dt.datetime(2021, 3, 1, 4, 0, 0), "X"),
        ("k4", dt.datetime(2021, 3, 1, 5, 0, 1), "Y"),
        # k5: lone row
        ("k5", dt.datetime(2021, 3, 1, 6, 0, 0), "X"),
        # k6: a qualifies via b two bins' worth of rows around an edge
        ("k6", dt.datetime(2021, 3, 1, 0, 0, 1), "X"),
        ("k6", dt.datetime(2021, 3, 1, 0, 59, 58), "Y"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, d string")
    want = {("k1", rows[0][1], "X"), ("k1", rows[1][1], "Y"),
            ("k6", rows[9][1], "X"), ("k6", rows[10][1], "Y")}
    base = {
        tuple(r)
        for r in band_partner_groups(df, ["k"], "ts", "d").collect()
    }
    binned = {
        tuple(r)
        for r in band_partner_groups(
            df, ["k"], "ts", "d", time_bins=True
        ).collect()
    }
    assert base == want
    assert binned == want


def test_auto_time_bins_decision_and_parity(spark):
    """time_bins="auto" (r8): the probe flips binned mode iff the max
    per-key distinct-group count reaches the threshold; both outcomes
    are row-identical to the explicit modes, and the chosen PLAN is the
    one the threshold dictates (binned mode is recognizable by its
    Generate/explode of the neighbor-bin array)."""
    e = _events(spark)
    want = sorted(
        map(
            tuple,
            band_partner_groups(e, ["user_id"], "ts", "event_type").collect(),
        )
    )

    def run(threshold):
        return band_partner_groups(
            e,
            ["user_id"],
            "ts",
            "event_type",
            time_bins="auto",
            auto_threshold=threshold,
        )

    # threshold far above any key -> the unbinned plan, same rows
    cold = run(10**9)
    assert "Generate" not in _plan(cold)
    assert sorted(map(tuple, cold.collect())) == want

    # threshold of 1 -> every key is "hot" -> the binned plan, same rows
    hot = run(1)
    assert "Generate" in _plan(hot)
    assert sorted(map(tuple, hot.collect())) == want


def test_auto_probe_counts_groups_not_rows(spark):
    """The probe measures DISTINCT (key, ts, diff) groups — duplicated
    source rows (the full-history multiplication) must not trip the
    threshold."""
    from etl_sber_spark.operators.bandjoin import _max_key_group_count

    base = dt.datetime(2021, 3, 1, 12, 0)
    rows = [("k", base + dt.timedelta(seconds=i), "X") for i in range(5)]
    df = spark.createDataFrame(
        rows * 40, "k string, ts timestamp, d string"  # 200 rows, 5 groups
    )
    grp = df.select("k", "ts", "d").distinct()
    assert _max_key_group_count(grp, ["k"]) == 5


def test_rule3_time_bins_passthrough_row_identical(spark):
    """rule_city_hopping(time_bins=...) must not change the rule's
    output on replayed reference data — auto stays unbinned at daily
    volume, and forced binning is row-identical anyway."""
    from .fixtures_bank import build_bank_tables
    from etl_sber_spark.plans.fraud import data_view
    from etl_sber_spark.sources.io import (
        read_terminals_xlsx,
        read_transactions_csv,
    )
    from etl_sber_spark.operators.scd import scd2_apply
    from etl_sber_spark import schemas

    ts = dt.datetime(2021, 3, 1, 23, 50)
    tx = read_transactions_csv(
        spark, "/root/reference/transactions_01032021.txt"
    )
    fact = tx.withColumn(
        "create_date", F.lit(ts).cast("timestamp")
    ).withColumn("load_date", F.to_date(F.lit(ts.date())))
    hist = scd2_apply(
        spark.createDataFrame([], schemas.TERMINALS_HIST),
        read_terminals_xlsx(
            spark, "/root/reference/terminals_01032021.xlsx"
        ),
        "terminal_id",
        ["terminal_type", "terminal_city", "terminal_address"],
        ts - dt.timedelta(hours=1),
    )
    bank = build_bank_tables(spark)
    view = data_view(
        bank["clients"], bank["accounts"], bank["cards"], fact, hist, ts
    ).localCheckpoint()
    base = sorted(map(tuple, rule_city_hopping(view).collect()))
    assert base  # non-vacuous on the reference day
    for mode in ("auto", True):
        got = sorted(
            map(tuple, rule_city_hopping(view, time_bins=mode).collect())
        )
        assert got == base, mode


def test_faithful_rejects_time_bins(spark):
    """The hot-key knob tunes the EXISTS rewrite; silently ignoring it
    on the faithful path would hand a caller the untuned plan with no
    signal (r8 review)."""
    import pytest

    view = spark.createDataFrame(
        [], "card_num string, terminal_city string, trans_date timestamp, "
        "passport_num string, name string, phone string",
    )
    with pytest.raises(ValueError, match="faithful"):
        rule_city_hopping(view, faithful=True, time_bins="auto")
    with pytest.raises(ValueError, match="faithful"):
        rule_city_hopping(view, faithful=True, time_bins=True)


def test_band_partner_groups_rejects_unknown_string_knob(spark):
    """Only the exact string 'auto' is a valid time_bins string; any
    other ('Auto', 'off', a typo) used to fall through `if time_bins:`
    and silently enable binned mode (r8 advice)."""
    import pytest

    from etl_sber_spark.operators.bandjoin import band_partner_groups

    df = spark.createDataFrame(
        [], "k string, ts timestamp, d string"
    )
    for bad in ("Auto", "off", "yes", ""):
        with pytest.raises(ValueError, match="time_bins"):
            band_partner_groups(
                df, ["k"], "ts", "d", time_bins=bad
            )
