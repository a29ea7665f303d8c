"""Band self-join EXISTS rewrite — the scale path for fraud rule 3.

The reference's rule 3 (main.py:489-529) self-joins transactions on
card_num with a ±1h band, ``city <>`` and ``ts <>`` residuals, then
immediately DISTINCTs the pair product back down to one row per
qualifying transaction. The join is only ever used as an EXISTS test,
so the O(n²)-per-key pair blowup is pure waste: a hot card with 10k
transactions in an hour produces 10⁸ pair rows that collapse to ≤10k.

This module computes the same qualifying set without materializing
pairs, in O(n log n):

1. project to the distinct ``(keys, ts, diff)`` groups (duplicates —
   e.g. the full-history client-version multiplication — cannot change
   an existence test);
2. three window counts over the groups:
   ``n_all``   partners within ±tol        (PARTITION BY keys, RANGE)
   ``n_same``  same-``diff`` within ±tol   (PARTITION BY keys+diff, RANGE)
   ``n_ts``    groups at exactly this ts   (PARTITION BY keys+ts)
   a partner with different ``diff`` AND different ``ts`` exists iff
   ``(n_all - n_same) - (n_ts - 1) >= 1`` — subtract the same-``diff``
   partners, then the same-ts different-``diff`` ones (all of which sit
   inside the band), and what remains is exactly the join's residual
   predicate;
3. semi-join the original rows against the qualifying groups.

RANGE frames need a numeric ordering key: ``unix_micros`` keeps the
band check microsecond-exact (casting to long seconds would admit pairs
up to tol+0.999999s apart — diverging from the faithful join).

Null semantics match the inner join: a row with a NULL key, ts, or
diff can satisfy neither side of the band predicate (NULL equality and
NULL ``<>`` are both unknown), so such rows are filtered out up front.

At 100 TB: two shuffles of the projected fact (distinct + semi-join)
plus window sorts over the already-deduplicated groups — vs the
faithful join's single shuffle followed by a per-key quadratic explode.
Row-identical to the faithful join by construction; hash-proven by the
driver-graded q_fraud_rule3_shape, whose DuckDB oracle still runs the
literal band join.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _non_null(cols: Sequence[str]) -> Column:
    return reduce(lambda a, b: a & b, (F.col(c).isNotNull() for c in cols))


#: groups-per-key above which "auto" flips to binned mode — below the
#: measured crossover (SCALE.md: a 2M-row key wins 4.4×, the pipeline
#: smoke's 16k-row hot card loses to the 3× replication) there is a
#: wide indifference band; 1M sits safely inside it.
AUTO_BIN_THRESHOLD = 1_000_000


def _max_key_group_count(grp: DataFrame, keys: Sequence[str]) -> int:
    """Largest per-key distinct-group count — ONE aggregate whose
    map-side combine reduces the shuffle to a row per (key, partition);
    the probe job auto mode pays to pick the window partitioning."""
    row = grp.groupBy(*keys).count().agg(F.max("count").alias("m")).first()
    return int(row.m) if row.m is not None else 0


def band_partner_groups(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    diff_col: str,
    tolerance_seconds: int = 3600,
    *,
    time_bins: bool | str = False,
    auto_threshold: int = AUTO_BIN_THRESHOLD,
) -> DataFrame:
    """Distinct ``(key_cols, ts_col, diff_col)`` groups that have at
    least one band partner: another group sharing ``key_cols`` within
    ``±tolerance_seconds`` on ``ts_col`` whose ``diff_col`` differs and
    whose ``ts_col`` differs.

    ``time_bins=True`` is the HOT-KEY escape hatch (r7): the default
    windows partition by ``key_cols`` alone, so one mega-hot key (an
    aggregator card with millions of band-relevant rows) sorts on ONE
    task — O(n_k log n_k) per key is the right complexity but the
    wrong parallelism. Binned mode partitions by
    ``(keys, floor(ts / tol))`` after replicating every group into its
    own and both NEIGHBOR bins (the interval-binning trick of
    operators/rangejoin.py): any partner within ±tol of a row in bin b
    lives in bins b-1..b+1 and appears EXACTLY ONCE in partition
    (keys, b), so the same three counts computed over the partition —
    taken only on rows whose OWN bin is b — are exactly the unbinned
    counts, and a hot key spreads over (time span / tol) tasks at the
    cost of a 3× replication of the distinct groups. Row-identical by
    construction; equality pinned on planted boundary cases
    (tests/test_bandjoin.py) and measured on a planted mega-hot card
    (SCALE.md). Default OFF: below millions-per-key the replication
    buys nothing.

    ``time_bins="auto"`` (r8) makes the flip data-driven: one EAGER
    probe job (the embedding_neardup precedent — a decision that picks
    a plan must run before the plan) measures the max distinct-group
    count per key and bins iff it reaches ``auto_threshold``. The probe
    is an extra scan + a map-side-combined count (tiny shuffle); callers
    on a known-cold keyspace pass ``False`` to skip it, known-hot
    ``True``. Either outcome is row-identical — auto only moves the
    window partitioning.
    """
    if isinstance(time_bins, str) and time_bins != "auto":
        # any other string ("Auto", "off", a typo) would fall through
        # to `if time_bins:` and silently enable binned mode (r8 advice)
        raise ValueError(
            "time_bins must be True, False, or 'auto'; got "
            f"{time_bins!r}"
        )
    keys = list(key_cols)
    grp = (
        df.filter(_non_null(keys + [ts_col, diff_col]))
        .select(*keys, ts_col, diff_col)
        .distinct()
    )
    if time_bins == "auto":
        # pin before probing: the probe job materializes the distinct
        # groups anyway, and without the pin the returned plan would
        # recompute that corpus-wide distinct from scratch — the
        # dominant scan+shuffle paid twice (r8 review)
        grp = grp.localCheckpoint(eager=False)
        time_bins = _max_key_group_count(grp, keys) >= auto_threshold
    us = F.unix_micros(F.col(ts_col))
    tol_us = tolerance_seconds * 1_000_000
    if time_bins:
        own_bin = F.floor(F.col("_us") / tol_us)
        grp = grp.select(
            "*",
            us.alias("_us"),
        ).select(
            "*",
            F.explode(
                F.array(own_bin - 1, own_bin, own_bin + 1)
            ).alias("_bin"),
        )
        part = [*keys, "_bin"]
        order_us = F.col("_us")
    else:
        part = keys
        order_us = us
    w_all = (
        Window.partitionBy(*part).orderBy(order_us).rangeBetween(-tol_us, tol_us)
    )
    w_same = (
        Window.partitionBy(*part, diff_col)
        .orderBy(order_us)
        .rangeBetween(-tol_us, tol_us)
    )
    w_ts = Window.partitionBy(*part, ts_col)
    counted = grp.select(
        "*",
        F.count(F.lit(1)).over(w_all).alias("_n_all"),
        F.count(F.lit(1)).over(w_same).alias("_n_same"),
        F.count(F.lit(1)).over(w_ts).alias("_n_ts"),
    )
    if time_bins:
        # counts are exact only for rows sitting in their OWN bin's
        # partition (their full ±tol neighborhood is present there);
        # the two neighbor-bin replicas exist to BE partners, not rows
        counted = counted.filter(
            F.floor(F.col("_us") / tol_us) == F.col("_bin")
        )
    return (
        counted.filter(
            F.col("_n_all") - F.col("_n_same") - (F.col("_n_ts") - F.lit(1))
            >= 1
        )
        .select(*keys, ts_col, diff_col)
    )


def exists_band_partner(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    diff_col: str,
    tolerance_seconds: int = 3600,
    *,
    time_bins: bool | str = False,
    auto_threshold: int = AUTO_BIN_THRESHOLD,
) -> DataFrame:
    """Rows of ``df`` (all columns preserved) whose ``(keys, ts, diff)``
    group has a band partner — the EXISTS form of the J9 band
    self-join. Rows with NULL key/ts/diff are dropped, matching what
    the inner join's predicate would do to them. ``time_bins`` is the
    hot-key parallelism knob — ``True``/``False``/``"auto"`` (see
    :func:`band_partner_groups`)."""
    keys = list(key_cols)
    qual = band_partner_groups(
        df,
        keys,
        ts_col,
        diff_col,
        tolerance_seconds,
        time_bins=time_bins,
        auto_threshold=auto_threshold,
    )
    joined = df.join(qual, on=keys + [ts_col, diff_col], how="left_semi")
    # the name-list join moves the join keys first; restore df's order
    return joined.select(*df.columns)
