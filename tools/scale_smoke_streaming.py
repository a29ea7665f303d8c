#!/usr/bin/env python3
"""Streaming-path scale smoke (VERDICT r7 #5): the one stack with soak
tests but no measured throughput row. Feeds each streaming surface a
micro-batched inbox at N× the reference's daily volume and records what
the engine itself reports per batch (``StreamingQuery.recentProgress``:
trigger wall time, input rows, state-store rows/bytes), the way the
pipeline smoke records per-phase shuffle bytes.

Surfaces measured (all availableNow + maxFilesPerTrigger=1, so file
count == micro-batch count and per-batch figures are comparable):

  inbox_drain     load_transactions_available_now — CSV parse + typed
                  fact append (the reference cron's streaming twin)
  live_mart       stream_enriched_transactions — per-batch 4-way
                  broadcast enrichment against at-processing-time dims
  velocity_state  velocity_alerts — the stateful fraud rule
                  (applyInPandasWithState); state rows/bytes per batch
                  is the figure of merit (bounded by active cards)
  hourly_rollup   watermarked windowed agg; state = open windows, the
                  shape that must NOT scale with input volume
  vector_ingest   stream_vector_ingest — frozen-quantizer serving-
                  column projection per batch, appended to the stored
                  ANN serving table

Deterministic throughout (same generators as scale_smoke_pipeline.py —
modular arithmetic, no RNG), so runs are comparable across rounds.

Usage:  python tools/scale_smoke_streaming.py [factor]   (default 10)
        1× = 15,700 tx rows and 2,000 ingested vectors, in 8 files.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TX_1X = 15_700  # the reference's measured daily volume
VEC_1X = 2_000  # one sf0.1 embeddings table of new vectors
N_FILES = 8  # micro-batches per stream
N_CITIES = 50
N_DIMS = 64
PROC_TS = dt.datetime(2021, 3, 1, 23, 50)


def batch_stats(q, wall_sec: float, input_rows: int | None = None) -> dict:
    """Fold recentProgress into the per-batch table SCALE.md reports.

    ``input_rows`` overrides the engine's numInputRows sum for
    throughput: inside foreachBatch each ACTION on the batch frame
    re-scans the source files, and the engine counts every re-scan
    (the mart's transform runs 3 actions -> 3x numInputRows), so
    rows/sec over the engine sum would flatter multi-action streams.
    """
    active = []
    for p in q.recentProgress:
        if not p or p.get("numInputRows", 0) == 0:
            continue
        ops = p.get("stateOperators") or []
        active.append(
            {
                "rows": p["numInputRows"],
                "sec": round(
                    p["durationMs"].get("triggerExecution", 0) / 1000, 3
                ),
                "state_rows": sum(op.get("numRowsTotal", 0) for op in ops),
                "state_mb": round(
                    sum(op.get("memoryUsedBytes", 0) for op in ops) / 1e6, 2
                ),
            }
        )
    total_rows = input_rows if input_rows is not None else sum(
        b["rows"] for b in active
    )
    busy = sum(b["sec"] for b in active)
    return {
        "wall_sec": round(wall_sec, 2),
        "n_batches": len(active),
        "rows_total": total_rows,
        "per_batch_sec": [b["sec"] for b in active],
        "max_batch_sec": max((b["sec"] for b in active), default=0.0),
        "rows_per_sec": round(total_rows / busy) if busy else None,
        "state_rows_final": active[-1]["state_rows"] if active else 0,
        "state_mb_peak": max((b["state_mb"] for b in active), default=0.0),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tx_total = TX_1X * factor // N_FILES * N_FILES  # even micro-batches
    vec_total = VEC_1X * factor // N_FILES * N_FILES
    n_cards = max(500, tx_total // 8)
    n_terminals = min(200 * factor, 20_000)

    from pyspark.sql import functions as F

    from etl_sber_spark import pipeline
    from etl_sber_spark.operators import annindex as ai
    from etl_sber_spark.operators.materialize import pin
    from etl_sber_spark.session import get_spark
    from etl_sber_spark.sinks.warehouse import Warehouse
    from etl_sber_spark.streaming.inbox import (
        load_transactions_available_now,
        stream_transactions,
    )
    from etl_sber_spark.streaming.mart import (
        T_LIVE,
        stream_enriched_transactions,
    )
    from etl_sber_spark.streaming.rollup import hourly_rollup, velocity_alerts
    from etl_sber_spark.streaming.vectors import stream_vector_ingest

    spark = get_spark("streaming-scale-smoke")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "64")
    # ProcessingTimeTimeout state (velocity) otherwise keeps an
    # availableNow query alive firing EMPTY batches until the 6h timers
    # expire (observed: 500+ no-data epochs) — this smoke measures
    # ingest cost, not timer eviction
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    def drain(q, timeout=900):
        q.awaitTermination(timeout)
        if q.isActive:
            q.stop()
    out: dict = {
        "factor": factor,
        "tx_rows": tx_total,
        "vec_rows": vec_total,
        "n_files": N_FILES,
        "phases": {},
    }

    def card_sql(col: str) -> str:
        return (
            f"format_string('4%03d %04d %04d %04d', {col} % 997, "
            f"CAST({col} / 10000 AS INT), {col} % 10000, {col} % 9973)"
        )

    def write_single_file(df, staging: str, dest: str, fmt: str, **opts):
        """One top-level FILE per micro-batch (the file source counts
        files, not directories — maxFilesPerTrigger=1 then means one
        batch per generated file)."""
        w = df.coalesce(1).write.mode("overwrite")
        for k, v in opts.items():
            w = w.option(k, v)
        getattr(w, fmt)(staging)
        part = glob.glob(os.path.join(staging, "part-*"))[0]
        shutil.move(part, dest)

    def write_tx_inbox(inbox: str) -> None:
        os.makedirs(inbox)
        per_file = tx_total // N_FILES
        with tempfile.TemporaryDirectory() as stg:
            for i in range(N_FILES):
                rows = (
                    spark.range(per_file)
                    .select((F.col("id") + i * per_file).alias("id"))
                    .select(
                        F.format_string("9%011d", "id").alias(
                            "transaction_id"
                        ),
                        F.date_format(
                            F.expr(
                                "timestamp'2021-03-01 00:00:00' + "
                                "make_interval(0, 0, 0, 0, 0, 0, "
                                "(id * 37) % 86400)"
                            ),
                            "yyyy-MM-dd HH:mm:ss",
                        ).alias("transaction_date"),
                        F.format_string(
                            "%d,%02d", F.col("id") % 9000 + 10,
                            F.col("id") % 100,
                        ).alias("amount"),
                        F.expr(card_sql(f"id % {n_cards}")).alias("card_num"),
                        F.when(F.col("id") % 3 == 0, F.lit("WITHDRAW"))
                        .otherwise(F.lit("PAYMENT"))
                        .alias("oper_type"),
                        F.when(F.col("id") % 20 == 0, F.lit("FAILED"))
                        .otherwise(F.lit("SUCCESS"))
                        .alias("oper_result"),
                        F.format_string(
                            "T%05d", (F.col("id") * 13) % n_terminals
                        ).alias("terminal"),
                    )
                )
                write_single_file(
                    rows,
                    stg,
                    os.path.join(inbox, f"tx_{i:02d}.csv"),
                    "csv",
                    sep=";",
                    header=True,
                )

    tmp = tempfile.mkdtemp(prefix="streaming_smoke_")
    try:
        # shared inputs -------------------------------------------------
        inbox = os.path.join(tmp, "inbox")
        t0 = time.perf_counter()
        write_tx_inbox(inbox)
        print(f"[gen] {round(time.perf_counter()-t0,2)}s", file=sys.stderr)
        out["gen_sec"] = round(time.perf_counter() - t0, 2)

        # 1. inbox drain: CSV -> typed partitioned fact ------------------
        t0 = time.perf_counter()
        q = load_transactions_available_now(
            spark,
            inbox,
            os.path.join(tmp, "fact"),
            os.path.join(tmp, "ck_fact"),
            PROC_TS,
            max_files_per_trigger=1,
        )
        drain(q)
        out["phases"]["inbox_drain"] = batch_stats(
            q, time.perf_counter() - t0
        )
        print(f"[inbox_drain] {out['phases']['inbox_drain']}", file=sys.stderr)
        n_loaded = spark.read.parquet(os.path.join(tmp, "fact")).count()
        assert n_loaded == tx_total, (n_loaded, tx_total)

        # 2. live mart: per-batch 4-way broadcast enrichment -------------
        wh = Warehouse(spark, os.path.join(tmp, "wh"))
        idx = spark.range(n_cards)
        bank = {
            "clients": pin(
                idx.select(
                    F.format_string("CL%07d", "id").alias("client_id"),
                    F.format_string("Last%d", "id").alias("last_name"),
                    F.format_string("First%d", "id").alias("first_name"),
                    F.format_string("Mid%d", "id").alias("patronymic"),
                    F.format_string("%04d %06d", F.col("id") % 10000, "id")
                    .alias("passport_num"),
                    F.lit(dt.date(2030, 1, 1)).alias("passport_valid_to"),
                    F.format_string("+7%010d", "id").alias("phone"),
                )
            ),
            "accounts": pin(
                idx.select(
                    F.format_string("ACC%07d", "id").alias("account"),
                    F.lit(dt.date(2030, 1, 1)).alias("valid_to"),
                    F.format_string("CL%07d", "id").alias("client"),
                )
            ),
            "cards": pin(
                idx.select(
                    F.concat(F.expr(card_sql("id")), F.lit("  ")).alias(
                        "card_num"
                    ),
                    F.format_string("ACC%07d", "id").alias("account"),
                )
            ),
        }
        terminals = spark.range(n_terminals).select(
            F.format_string("T%05d", "id").alias("terminal_id"),
            F.when(F.col("id") % 2 == 0, F.lit("POS"))
            .otherwise(F.lit("ATM"))
            .alias("terminal_type"),
            F.format_string("CITY%02d", F.col("id") % N_CITIES).alias(
                "terminal_city"
            ),
            F.format_string("Street %d", "id").alias("terminal_address"),
        )
        pipeline.load_terminals(
            wh, terminals, PROC_TS - dt.timedelta(hours=12)
        )
        t0 = time.perf_counter()
        q = stream_enriched_transactions(
            spark,
            inbox,
            wh,
            os.path.join(tmp, "ck_mart"),
            bank,
            as_of=PROC_TS,
            max_files_per_trigger=1,
        )
        drain(q)
        out["phases"]["live_mart"] = batch_stats(
            q, time.perf_counter() - t0, input_rows=tx_total
        )
        print(f"[live_mart] {out['phases']['live_mart']}", file=sys.stderr)
        n_live = wh.read(T_LIVE).count()
        assert n_live == tx_total, (n_live, tx_total)  # full dim coverage

        # 3. stateful velocity rule: state bounded by active cards ------
        t0 = time.perf_counter()
        q = (
            velocity_alerts(
                stream_transactions(spark, inbox, max_files_per_trigger=1),
                max_per_hour=5,
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ck_vel"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q)
        out["phases"]["velocity_state"] = batch_stats(
            q, time.perf_counter() - t0
        )
        print(f"[velocity_state] {out['phases']['velocity_state']}", file=sys.stderr)

        # 3b. sharded velocity (r8): same algebra, state keyed by
        # hash(card) % n_shards — per-batch cost should drop from
        # O(active cards) Python invocations to O(shards). r9: the
        # smoke runs the "auto" sizing (8 × task slots, floor 64) and
        # records the resolved count — on this local[32] box auto
        # resolves to 256, exactly the r8 measured default, at every
        # volume factor (the rule is cluster-derived, not data-derived)
        from etl_sber_spark.streaming.rollup import (
            MIN_AUTO_SHARDS,
            SHARDS_PER_SLOT,
            velocity_alerts_sharded,
        )

        auto_shards = max(
            MIN_AUTO_SHARDS,
            SHARDS_PER_SLOT * spark.sparkContext.defaultParallelism,
        )
        t0 = time.perf_counter()
        q = (
            velocity_alerts_sharded(
                stream_transactions(spark, inbox, max_files_per_trigger=1),
                max_per_hour=5,
                n_shards="auto",
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ck_vel_sh"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q)
        out["phases"]["velocity_sharded"] = batch_stats(
            q, time.perf_counter() - t0
        )
        out["phases"]["velocity_sharded"]["n_shards_auto"] = auto_shards
        print(
            f"[velocity_sharded] {out['phases']['velocity_sharded']}",
            file=sys.stderr,
        )

        # 4. watermarked windowed agg: state = open windows, not input --
        t0 = time.perf_counter()
        q = (
            hourly_rollup(
                stream_transactions(spark, inbox, max_files_per_trigger=1)
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ck_roll"))
            .trigger(availableNow=True)
            .start()
        )
        drain(q)
        out["phases"]["hourly_rollup"] = batch_stats(
            q, time.perf_counter() - t0
        )
        print(f"[hourly_rollup] {out['phases']['hourly_rollup']}", file=sys.stderr)

        # 5. vector ingest against frozen artifacts ----------------------
        base = spark.read.parquet(
            "/root/testdata/sf0.1/embeddings.parquet"
        ).select("vec_id", "embedding")
        vwh = Warehouse(spark, os.path.join(tmp, "vwh"))
        stored = ai.build_ann_index(vwh, base, n_lists=64, n_iter=2)
        vwh.overwrite_partitions(
            stored.withColumn("batch_id", F.lit(-1)), "ann_serving",
            ["batch_id"],
        )
        ai.bind_serving(vwh)
        vec_inbox = os.path.join(tmp, "vec_inbox")
        os.makedirs(vec_inbox)
        per_file = vec_total // N_FILES
        with tempfile.TemporaryDirectory() as stg:
            for i in range(N_FILES):
                # deterministic new vectors: base row j perturbed on
                # coordinate (k % 64), ids disjoint from the base corpus
                rows = (
                    spark.range(per_file)
                    .select((F.col("id") + i * per_file).alias("k"))
                    .join(
                        base.withColumn(
                            "j", F.col("vec_id") % VEC_1X
                        ).drop("vec_id"),
                        F.col("k") % VEC_1X == F.col("j"),
                    )
                    .select(
                        (F.col("k") + 10_000_000).alias("vec_id"),
                        F.expr(
                            f"transform(embedding, (x, i) -> CAST(x + "
                            f"CASE WHEN i = k % {N_DIMS} THEN 0.07 "
                            "ELSE 0.0 END AS FLOAT))"
                        ).alias("embedding"),
                    )
                )
                write_single_file(
                    rows, stg, os.path.join(vec_inbox, f"v_{i:02d}.json"),
                    "json",
                )
        t0 = time.perf_counter()
        q = stream_vector_ingest(
            spark,
            vec_inbox,
            vwh,
            os.path.join(tmp, "ck_vec"),
            max_files_per_trigger=1,
        )
        drain(q)
        out["phases"]["vector_ingest"] = batch_stats(
            q, time.perf_counter() - t0, input_rows=vec_total
        )
        print(f"[vector_ingest] {out['phases']['vector_ingest']}", file=sys.stderr)
        n_streamed = (
            vwh.read("ann_serving").filter(F.col("batch_id") >= 0).count()
        )
        assert n_streamed == vec_total, (n_streamed, vec_total)

        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
