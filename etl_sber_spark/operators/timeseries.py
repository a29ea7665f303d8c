"""Time-series regularization: bucketed resampling with gap filling.

Every metrics/observability engine (and the reference's own daily-batch
cadence) eventually needs "one row per key per time step, even for steps
with no data" — trailing-average features, SLA dashboards, and training
label alignment all break on ragged series. The reference delegates
calendarization to Oracle (``CONNECT BY``-style row generators are the
classic idiom); Spark-first it is pure DataFrame algebra:

- :func:`resample` — aggregate events into fixed-width buckets per key:
  one hash-aggregate, output keyed (key, bucket).
- :func:`time_spine` — the dense per-key calendar: min/max bucket per
  key (tiny aggregate) exploded through ``sequence()`` — the spine is
  GENERATED, never shuffled (explode is a narrow op over one row per
  key).
- :func:`gap_fill` — resample + spine left-join + last-observation-
  carried-forward via ``last(..., ignorenulls=True)`` over the per-key
  bucket window, plus an ``is_gap`` flag so downstream can tell carried
  values from observed ones.

Scale: the spine's row count is keys × steps — independent of event
volume, and each key's spine explodes from ONE aggregated row, so a
100 TB event table with 1M keys × 1k steps yields a 1G-row spine
without any corpus-sized shuffle. The LOCF window sorts per key on the
already-bucketed (small) frame, not the raw events. Keys whose span is
pathological (a sensor with one reading in 1970 and one today) bound
their own spine by ``max_steps`` — a guard against one bad key
generating an unbounded calendar.

Differential oracle: DuckDB ``generate_series`` + ``last_value(...
IGNORE NULLS)`` replays the exact algebra (q_gapfill).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 1k steps/key default cap: a spine row is ~tens of bytes, so this
# bounds per-key calendar blowup at ~100 kB even for pathological spans.
DEFAULT_MAX_STEPS = 1000


def bucket_ts(ts_col: str, step_seconds: int):
    """Floor a timestamp to its bucket start (epoch-aligned).

    Integer arithmetic only: long / long is DOUBLE division in Spark,
    and a 1.7e15-microsecond epoch divided as a double can land a hair
    under an exact bucket boundary and truncate into the previous
    bucket. And ``x - pmod(x, step)`` rather than ``div``: `div`
    truncates toward ZERO, so a pre-1970 (negative-epoch) timestamp
    would bucket to a start AFTER the event, violating the floor
    contract (ADVICE round 4); pmod's remainder is non-negative for any
    sign of x, making this the exact floor to a multiple of step.
    """
    step_us = step_seconds * 1_000_000
    return F.timestamp_micros(
        F.expr(
            f"unix_micros({ts_col}) - pmod(unix_micros({ts_col}), {step_us})"
        )
    )


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    value_decimal: tuple[int, int] = (18, 2),
) -> DataFrame:
    """(key, bucket, n_events, value_sum): fixed-width bucket aggregate.

    ``value_sum`` accumulates in DECIMAL (exact, order-independent — the
    repo-wide float-aggregation rule) and is emitted as DOUBLE.
    ``value_decimal`` is the accumulator's (precision, scale) — the
    default (18,2) fits 2-decimal business metrics up to 1e16; a series
    whose values exceed the precision FAILS the cast under ANSI (the
    correct loud behavior — under ANSI-off it would silently null rows
    out of the sum), so widen it to match the column's real range, e.g.
    ``(38, 2)`` for astronomical counters (round-4 review finding).
    """
    p, s = value_decimal
    return (
        df.select(
            F.col(key_col),
            bucket_ts(ts_col, step_seconds).alias("bucket"),
            F.col(value_col).cast(T.DecimalType(p, s)).alias("_v"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").cast("double").alias("value_sum"),
        )
    )


def time_spine(
    bucketed: DataFrame,
    key_col: str,
    step_seconds: int,
    max_steps: int = DEFAULT_MAX_STEPS,
) -> DataFrame:
    """Dense (key, bucket) calendar spanning each key's observed range.

    Built from ONE tiny aggregate (min/max bucket per key) exploded
    through ``sequence()`` — generation, not shuffling. Keys whose span
    exceeds ``max_steps`` steps raise: a single corrupt timestamp (the
    1970 sentinel classic) would otherwise generate an unbounded
    calendar for that key and skew the whole stage.
    """
    span = bucketed.groupBy(key_col).agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    n_steps = (
        F.unix_micros(F.col("_mx")) - F.unix_micros(F.col("_mn"))
    ) / F.lit(step_seconds * 1_000_000) + 1
    # the guard lives INSIDE the sequence's upper bound: a standalone
    # guard column would be pruned by Catalyst (nothing consumes it) and
    # never evaluate — raise_error must sit on the consumed path
    mx_guarded = F.when(n_steps <= max_steps, F.col("_mx")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("time_spine: key "),
                F.col(key_col).cast("string"),
                F.lit(f" spans more than {max_steps} steps"),
            ).cast("string")
        ).cast("timestamp")
    )
    step = F.expr(f"INTERVAL {step_seconds} SECONDS")
    return span.select(
        key_col,
        F.explode(F.sequence(F.col("_mn"), mx_guarded, step)).alias(
            "bucket"
        ),
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    max_steps: int = DEFAULT_MAX_STEPS,
    value_decimal: tuple[int, int] = (18, 2),
) -> DataFrame:
    """Regularized series with LOCF: one row per key per step.

    Output: (key, bucket, n_events, value_sum, value_locf, is_gap) —
    ``value_sum`` is NULL on gap rows (no observation), ``value_locf``
    carries the latest earlier bucket's sum forward (never NULL after a
    key's first observed bucket, which by construction is the spine
    start), ``is_gap`` marks carried rows. The LOCF window orders by
    bucket alone — (key, bucket) is unique post-aggregate, so no
    tiebreak is needed and the window is deterministic.
    """
    b = resample(
        df, key_col, ts_col, value_col, step_seconds, value_decimal
    )
    spine = time_spine(b, key_col, step_seconds, max_steps)
    j = spine.join(b, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "value_sum",
        F.last("value_sum", ignorenulls=True).over(w).alias("value_locf"),
        F.col("n_events").isNull().alias("is_gap"),
    )
