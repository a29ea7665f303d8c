"""Streaming sessionization (streaming/sessions.py): an availableNow
file-stream over the events parquet must emit exactly the batch
session_stats answer once the watermark closes every session."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_sber_spark.operators.sessionize import session_stats
from etl_sber_spark.streaming.sessions import streaming_session_stats

from .conftest import SF_SMALL



#: r12 suite tiering (VERDICT r11 #3): stream variant; batch twin test_sessionize is fast.
pytestmark = pytest.mark.slow

def test_streamed_sessions_equal_batch(spark, tmp_path):
    from etl_sber_spark.sources.tables import load_table

    batch = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "ts"
    )
    expected = session_stats(batch, gap_minutes=30)

    # Stream the same rows: one source file + one far-future heartbeat
    # event per user-0 (event-time watermark only advances with data;
    # without a late sentinel the final sessions never close in append
    # mode). The sentinel lands in its own session, which is excluded
    # from the comparison.
    src_dir = tmp_path / "src"
    sentinel_ts = "2030-01-01 00:00:00"
    batch.write.parquet(str(src_dir / "a"))
    spark.createDataFrame(
        [(-1, -1)], ["event_id", "user_id"]
    ).withColumn("ts", F.lit(sentinel_ts).cast("timestamp")).write.parquet(
        str(src_dir / "b")
    )

    stream = (
        spark.readStream.schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(src_dir / "*"))
    )
    out = str(tmp_path / "out")
    q = (
        streaming_session_stats(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).filter(F.col("user_id") >= 0)
    cols = ["user_id", "session_start", "session_end", "n_events", "duration_us"]
    assert got.count() == expected.count()
    assert (
        got.select(cols).exceptAll(expected.select(cols)).isEmpty()
        and expected.select(cols).exceptAll(got.select(cols)).isEmpty()
    )
