"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively (the brief's canonical example of a custom operator).

``asof_join(left, right, key, ts)``: each left row is matched to the
LATEST right row with ``right.ts <= left.ts`` for the same key — the
temporal-correctness join behind point-in-time features, price lookups,
and SCD2-style "state as of event time".

Implementation is the scalable union-window rewrite, NOT a band/theta
join:

1. union left and right rows with a side tag (right sorts before left
   on timestamp ties, so an exactly-simultaneous right row matches);
2. one window per key ordered by (ts, side): ``last_value(right attrs,
   ignoreNulls)`` carries the most recent right row forward;
3. keep left rows.

Cost: ONE shuffle+sort on the key — O(n log n), independent of how far
back matches reach (a band join would need an unbounded band). This is
the same shape q_band_window uses for the ±1h rule, generalized to
carry payload columns.

Right rows must be unique per (key, ts) — the caller dedupes (e.g.
keep-latest by a unique column) because "which of several simultaneous
right rows wins" is otherwise undefined in every engine (DuckDB's
native ASOF JOIN has the same precondition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join; right payload columns arrive suffixed (NULL when
    no right row precedes the left row)."""
    tagged_right = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
        *[F.lit(None).alias("_l_" + c) for c in left.columns],
    )
    tagged_left = left.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_cols],
        *[F.col(c).alias("_l_" + c) for c in left.columns],
    )
    unioned = tagged_right.unionByName(tagged_left)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The payload travels as ONE struct: per-column last(ignorenulls)
    # would substitute a STALE older row's value wherever the matched
    # (latest) right row has a NULL attribute — and different columns
    # could then come from different right rows (round-3 review
    # finding; DuckDB's native ASOF, the q_asof_join oracle, returns
    # the matched row's NULLs). A struct is non-null whenever the row
    # is a right row, so last(ignorenulls) selects whole rows.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col(ts).alias("_ts"),
            *[F.col(c + suffix).alias(c) for c in right_cols],
        ),
    )
    carried = unioned.select(
        "*",
        F.last(payload, ignorenulls=True).over(w).alias("_m"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col("_l_" + c).alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(c + suffix) for c in right_cols],
        F.col("_m")["_ts"].alias(ts + suffix),
    )
