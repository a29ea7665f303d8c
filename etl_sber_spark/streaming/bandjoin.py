"""Stream-stream band self-join: fraud rule 3 as a LIVE query.

The reference evaluates rule 3 (card used in two cities within one
hour — main.py:489-529) once per nightly batch. A live deployment wants
the alert within seconds of the *second* transaction arriving; this
module expresses the same ±1h band self-join (SURVEY.md §2.5 J9) as a
Structured Streaming stream-stream self-join — the canonical Spark
shape for it (SURVEY.md §2.9 row 3):

- both sides are the SAME watermarked transaction stream (a streaming
  self-join: Spark maintains one state store per side, keyed by
  card_num);
- the join condition carries the equi key (card_num) plus the
  time-range constraint (``r.ts BETWEEN l.ts - 1h AND l.ts + 1h``), so
  Spark can bound both state stores: a row is dropped from state once
  the watermark passes its band horizon — state is O(traffic within
  watermark + tolerance), NOT O(stream length);
- the pair product collapses to the EXISTS set with
  ``dropDuplicatesWithinWatermark`` on the left row id (same algebra as
  the batch rewrite, operators/bandjoin.py: the join is only an
  existence test) — dedup state evicts at the watermark too.

Parity contract (tests/test_streaming_bandjoin.py): replaying a
reference day through this stream equals the batch
``exists_band_partner`` on the same rows, column for column.

Scale: the only shuffle is the join's hash partitioning on card_num,
identical to the batch plan; per-card state is bounded by the band
width. Skewed cards (payment processors) are the same hazard as in
batch — AQE does not apply inside micro-batches, so a hot card
serializes its partition; the mitigation is the batch path (windowed
rewrite) for offline recompute, this path for alerting latency.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "microsecond": 1e-6,
    "millisecond": 1e-3,
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _interval_seconds(interval: str) -> float:
    """Seconds in a Spark calendar-interval string like '2 hours' or
    '90 minutes' (the withWatermark grammar: `<value> <unit>` pairs)."""
    toks = interval.strip().lower().split()
    if len(toks) % 2:
        raise ValueError(f"unparseable interval: {interval!r}")
    total = 0.0
    for value, unit in zip(toks[::2], toks[1::2]):
        unit = unit.rstrip("s")
        if unit not in _UNIT_SECONDS:
            raise ValueError(f"unknown interval unit {unit!r} in {interval!r}")
        total += float(value) * _UNIT_SECONDS[unit]
    return total


def stream_band_partners(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    diff_col: str,
    id_col: str,
    tolerance_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows of the stream that have a band partner, live.

    A row qualifies when another row shares every ``key_cols``, differs
    in ``diff_col`` AND in ``ts_col``, and lies within
    ``±tolerance_seconds`` on ``ts_col`` — the J9 predicate. Emits each
    qualifying left row once (``dropDuplicatesWithinWatermark`` on
    ``id_col``); append output mode.

    ``watermark`` must be ≥ the tolerance, or a partner arriving
    later-than-watermark after its mate is silently missed (Spark
    evicts the mate's state at watermark - tolerance). In a FRAUD path
    that failure mode is silently-missing alerts, so the relationship
    is validated here and a violation raises instead. NULL key/ts/diff
    rows cannot satisfy the join predicate, matching the batch
    operator's up-front filter.
    """
    wm_seconds = _interval_seconds(watermark)
    if wm_seconds < tolerance_seconds:
        raise ValueError(
            f"watermark {watermark!r} ({wm_seconds}s) < tolerance "
            f"{tolerance_seconds}s: join state would evict before a "
            "band partner can arrive, silently dropping alerts"
        )
    keys = list(key_cols)
    cols = [*keys, ts_col, diff_col, id_col]
    wm = stream.select(*cols).withWatermark(ts_col, watermark)
    left = wm.alias("l")
    right = wm.alias("r")
    key_eq = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    lo = F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {tolerance_seconds} SECOND")
    hi = F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {tolerance_seconds} SECOND")
    cond = (
        F.col(f"r.{ts_col}").between(lo, hi)
        & (F.col(f"l.{diff_col}") != F.col(f"r.{diff_col}"))
        & (F.col(f"l.{ts_col}") != F.col(f"r.{ts_col}"))
    )
    for eq in key_eq:
        cond = cond & eq
    paired = left.join(right, cond, "inner").select(
        *[F.col(f"l.{c}").alias(c) for c in cols]
    )
    # one output row per qualifying left row; state bounded by watermark
    return paired.dropDuplicatesWithinWatermark([id_col])
