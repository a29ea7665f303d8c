#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
parseable JSON line LAST: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec, ...}, "sf": ...}. (A detailed
first-run line precedes it; the driver's tail capture reads the final,
compact line — the round-5 single-line format outgrew the tail window
and parsed as null.)

Timing = full plan execution materialized via a `noop`-format write, so
every output column is actually computed (a count() would let Catalyst
prune projection/aggregate expressions and under-measure — flagged in
round-1 ADVICE).

Round-3 methodology notes (both changes measured, see R3_NOTES.md):

- Deferred-cleanup isolation: before each query's timed window the
  harness runs Python gc + JVM System.gc(), so the ContextCleaner can
  reclaim earlier queries' localCheckpoint blocks OUTSIDE any timed
  window. Without it the cleanup debt aliases into random later
  queries and COMPOUNDS: the same bm25 plan measured 0.98 s and
  6.7 s across bench runs; with it, tail queries match their
  standalone timings (probe: 32-query total 43.6 -> 25.8 s run-to-run
  on the same machine). The cost sits between windows — each query
  still pays its own full cost (scan, shuffles, operator-internal
  cache materialization; caches cleared between queries).
- Each query executes TWICE and the min is reported
  ("queries_first" ships the one-shot series, methodology-compatible
  with r1/r2): this VM shows ~5% average CPU steal, and min-of-2
  suppresses host-noise spikes landing inside one window.

Round-8 methodology (VERDICT r7 #1 — the artifact must attribute its
own noise): the final JSON carries a ``machine`` block measured around
the timed loop, so a total that regresses on a round with no code
change is self-diagnosing instead of prose-diagnosed:

- ``load_before`` / ``load_after``: 1-minute loadavg at the loop's
  start/end — external multi-core contention (this box showed 0.01→21
  swings with zero local processes in round 7).
- ``steal_pct``: CPU-steal share of all jiffies spent during the loop
  (/proc/stat delta) — hypervisor contention.
- ``calib_before_s`` / ``calib_after_s``: wall time of a FIXED
  single-core integer loop (xorshift-style LCG, 5M iterations,
  min-of-3) — a machine-speed constant. Comparable across rounds:
  if the calibration time inflates with the total, the host changed,
  not the code. Quiet-host reference: see BENCHLOG.md.

Round-11 methodology (VERDICT r10 #3 — quiet-by-construction): the r10
artifact was captured at load 6.39 and read 10% over r9 on UNCHANGED
code; the floors table adjudicated it as noise, but only by forensics.
The harness now adjudicates itself:

- ``load_ext``: 1-minute loadavg sampled at PROCESS START, before any
  Spark work — ``load_before`` (kept for series continuity) is read
  after the warmup pass, whose own 50 queries inflate the 1-minute
  average, so it conflates external contention with the bench's own
  footprint; ``load_ext`` is the external signal.
- ``busy_ext_pct``: instantaneous whole-box CPU busy share (1 s
  /proc/stat delta) sampled alongside ``load_ext`` — the loadavg is a
  slow EWMA, so it lags a just-started neighbor and overhangs a
  just-finished one; the pair covers both directions.
- bounded wait-for-quiet: while ``load_ext`` exceeds
  ``$SPARK_GRAFT_BENCH_QUIET_LOAD`` (default 1.0 — quiet rounds read
  0.03-0.10, contended ones 4-9) or ``busy_ext_pct`` exceeds
  ``$SPARK_GRAFT_BENCH_QUIET_BUSY_PCT`` (default 8), the harness
  sleeps and resamples, up to ``$SPARK_GRAFT_BENCH_MAX_WAIT_S``
  (default 300; 0 disables — use that when iterating on a box you
  loaded yourself). ``quiet_wait_s`` records what was spent.
- ``contended``: the tool's OWN verdict — true when the post-wait
  start gate still fails (``busy_ext_pct`` when readable, else
  ``load_ext``), the loop's ``steal_pct`` > 1.0, the before/after
  calibration pair diverges >20% (contention that arrived mid-run —
  the calibrations are single-core fixed work run while Spark is
  idle, so their spread is external by construction), or the
  per-query ratios vs the BENCHLOG floors show UNIFORM inflation
  (``floor_ratio_median`` > 1.25 with interquartile spread < 0.35 —
  whole-host bandwidth/frequency slowdown no point signal catches;
  host noise inflates every query alike, a code regression
  concentrates in the queries it touched, and floors are historical
  minima so a new regression cannot contaminate the reference).
  Cross-round comparison should trust a contended=false artifact
  directly and route a contended=true one through the BENCHLOG
  floors.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Headline set: scan/filter/agg, multi-join, windows, band-join scale
# path, dedup/minhash-LSH, similarity search, text stats, multimodal.
HEADLINE = [
    "q_flagship_revenue",
    "q_agg_sum_by_key",
    "q_multiway_join",
    "q_band_window",
    "q_band_selfjoin",
    "q_topk",
    "q_semi_union_rule1",
    "q_groupby_dedup",
    "q_window_running",
    "q_dedup_exact",
    "q_minhash_signatures",
    "q_lsh_candidates",
    "q_cosine_topk",
    "q_cosine_lsh",
    "q_text_stats",
    "q_simhash",
    "q_multimodal_decode",
    "q_scd2_snapshot",
    "q_fraud_rule3_shape",
    "q_window_range",
    "q_time_bucket_rollup",
    "q_rolling_hash",
    "q_doc_overlap",
    # round 3: graded-but-previously-unbenched heavy queries so
    # round-over-round deltas keep meaning as the registry grows
    # (BENCH_r03 keys ⊇ BENCH_r02 keys).
    "q_asof_join",
    "q_range_join",
    "q_winnow",
    "q_percentile",
    # round 3: training-pipeline preprocessing operators
    "q_stratified_sample",
    "q_seq_packing",
    "q_bm25_rank",
    "q_pii_redact",
    "q_curate",
    # round 4: sessionization, time-series gap fill, DSIR selection
    "q_sessionize",
    "q_gapfill",
    "q_dsir_weights",
    # round 5: the remaining graded registry (VERDICT r4 #2) — BENCH
    # keys now cover ALL 50 driver-graded queries, so round-over-round
    # deltas grade the whole surface.
    "q_scan_filter",
    "q_left_anti",
    "q_changed_rows",
    "q_self_rejoin",
    "q_salted_agg",
    "q_conditional_agg",
    "q_grouping_sets",
    "q_window_funcs",
    "q_set_ops",
    "q_scalar_funcs",
    "q_correlated_exists",
    "q_array_funcs",
    "q_ngram_jaccard",
    "q_embedding_neardup",
    "q_ivf_topk",
]


def _proc_stat_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line.
    (0, 0) when unreadable (non-Linux) — steal_pct then reads 0."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        # fields 9/10 (guest, guest_nice) are already accounted inside
        # user/nice — summing them would double-count guest time and
        # bias steal_pct low exactly when contention is guest-heavy
        return steal, sum(vals[:8])
    except Exception:
        return 0, 0


def _calibrate(n_runs: int = 3, n_iter: int = 5_000_000) -> float:
    """Fixed single-core work (LCG loop), min-of-N wall seconds.

    The work is a machine-speed constant: CPython version and the loop
    are pinned, so round-over-round this number moves ONLY when the
    host does (contention, steal, frequency). If a bench total inflates
    and this inflates with it, the artifact itself shows the host — not
    the code — changed (VERDICT r7 #1)."""
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        x = 1
        for _ in range(n_iter):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        best = min(best, time.perf_counter() - t0)
    if x == 0:  # keep the loop's result live (defensive; never true)
        print("calibration underflow", file=sys.stderr)
    return round(best, 4)


def _busy_pct(interval: float = 1.0) -> float:
    """Instantaneous whole-box CPU busy share over ``interval`` seconds
    (/proc/stat delta; idle + iowait count as idle). Complements the
    1-minute loadavg, which is a slow EWMA — after a heavy local run it
    reads high for a minute on an already-idle box, and conversely can
    read low while a neighbor just started. -1.0 when unreadable
    (non-Linux), which disables the busy gate."""
    def _snap():
        try:
            with open("/proc/stat") as fh:
                vals = [int(v) for v in fh.readline().split()[1:]]
            idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
            return idle, sum(vals)
        except (OSError, ValueError, IndexError):
            return None
    a = _snap()
    if a is None:
        return -1.0
    time.sleep(interval)
    b = _snap()
    if b is None or b[1] <= a[1]:
        return -1.0
    return round(100.0 * (1.0 - (b[0] - a[0]) / (b[1] - a[1])), 1)


def _wait_for_quiet() -> tuple[float, float, float]:
    """Bounded wait for external quiet (module docstring, round-11
    block). Returns (final load_ext, final busy_pct, seconds waited).
    Sampled before any Spark work so the readings are external
    contention, not the bench's own footprint. Two gates: the 1-minute
    loadavg (slow signal, catches sustained neighbors) and the
    instantaneous busy share (fast signal, catches a just-started
    neighbor the average hasn't seen and clears a just-finished one
    the average still carries)."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "1.0"))
    busy_thr = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_BUSY_PCT", "8"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "300"))

    def _quiet(busy, prev_busy, load):
        # busy is the gate when readable: the loadavg EWMA overhangs
        # finished work for a minute (measured: busy 0.0% at loadavg
        # 2.5 right after a local pytest run — an idle box the load
        # gate would have waited the whole budget on). Two consecutive
        # quiet 1-s windows guard against a bursty neighbor aliasing
        # one sample. loadavg gates only when /proc/stat is
        # unreadable (non-Linux).
        if busy < 0:
            return load <= threshold
        return busy <= busy_thr and 0 <= prev_busy <= busy_thr

    waited = 0.0
    load = os.getloadavg()[0]
    prev_busy = _busy_pct()  # two up-front samples so a quiet box
    busy = _busy_pct()       # passes in ~2 s instead of one sleep step
    while not _quiet(busy, prev_busy, load) and waited < budget:
        step = min(10.0, budget - waited)
        time.sleep(step)
        waited += step
        load = os.getloadavg()[0]
        prev_busy = busy
        busy = _busy_pct()
    if not _quiet(busy, prev_busy, load):
        print(
            f"bench: still contended after {waited:.0f}s wait "
            f"(busy {busy:.1f}% vs {busy_thr}%, loadavg {load:.2f} vs "
            f"{threshold}) — artifact will be marked contended",
            file=sys.stderr,
        )
    return round(load, 2), busy, round(waited, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_ext, busy_ext, quiet_wait = _wait_for_quiet()
    from etl_sber_spark.plans.queries import QUERIES
    from etl_sber_spark.session import get_spark

    spark = get_spark("bench")
    missing = [n for n in HEADLINE if n not in QUERIES]
    if missing:
        print(f"bench: skipping unregistered queries: {missing}", file=sys.stderr)
    names = [n for n in HEADLINE if n in QUERIES]

    # Warm-up pass: run every headline query once at the smallest SF so
    # the timed pass measures the PLAN, not JVM startup + whole-stage
    # codegen compilation (which is per-query-shape, amortized to zero
    # on any long-running cluster).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in names:
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # warmup must never fail the bench
                print(f"bench: warmup {name} failed: {exc}", file=sys.stderr)
    else:
        spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Machine-context block: sampled AROUND the timed loop so the
    # artifact attributes its own noise (VERDICT r7 #1).
    load_before = round(os.getloadavg()[0], 2)
    steal0, total0 = _proc_stat_jiffies()
    calib_before = _calibrate()

    timings: dict[str, float] = {}
    first: dict[str, float] = {}
    for name in names:
        # Each query measured from a clean cache state: operator-internal
        # cache/pin frames (LSH bands, shingle sets) otherwise accumulate
        # across the session and inflate later queries' GC time. Timing
        # still INCLUDES each query's own cache materialization.
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.1)
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        first[name] = runs[0]
        timings[name] = min(runs)

    calib_after = _calibrate()
    steal1, total1 = _proc_stat_jiffies()
    load_after = round(os.getloadavg()[0], 2)
    steal_pct = round(100.0 * (steal1 - steal0) / max(1, total1 - total0), 2)
    quiet_load = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "1.0"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Uniform-inflation signal vs the BENCHLOG per-query floors (only
    # meaningful at the floors' own SF): host contention inflates ALL
    # queries by a similar factor (measured: a green-gates run read
    # 1.4-1.7x on every query incl. code untouched for rounds, steal
    # 0.07% — bandwidth/frequency contention single-core calib
    # under-detects); a code regression concentrates in the queries it
    # touched. Floors are historical minima, so a new regression can
    # never contaminate the reference. median>1.25 with a tight spread
    # = host-slow; a wide spread is left visible (might be real).
    floor_med = floor_spread = None
    try:
        if sf_val == 0.1:
            import re as _re

            floors = {}
            with open(os.path.join(REPO, "BENCHLOG.md")) as fh:
                for line in fh:
                    m = _re.match(r"\|\s*(q_\w+)\s*\|\s*([\d.]+)\s*\|", line)
                    if m:
                        floors[m.group(1)] = float(m.group(2))
            ratios = sorted(
                timings[q] / floors[q]
                for q in timings
                if q in floors and floors[q] > 0
            )
            if len(ratios) >= 10:
                n_r = len(ratios)
                floor_med = round(ratios[n_r // 2], 3)
                floor_spread = round(
                    ratios[3 * n_r // 4] - ratios[n_r // 4], 3
                )
    except OSError:
        pass
    machine = {
        "cpus": os.cpu_count(),
        "load_ext": load_ext,
        "busy_ext_pct": busy_ext,
        "quiet_wait_s": quiet_wait,
        "load_before": load_before,
        "load_after": load_after,
        "steal_pct": steal_pct,
        "calib_before_s": calib_before,
        "calib_after_s": calib_after,
        "floor_ratio_median": floor_med,
        "floor_ratio_spread": floor_spread,
        # The tool's own verdict (round-11 block): trust the total
        # directly when false; route through the BENCHLOG floors when
        # true. Three independent signals, any one suffices:
        # - start-time external contention: busy_ext_pct when readable
        #   (the instantaneous signal — mirrors the wait gate; loadavg
        #   overhangs finished work and would contradict the gate that
        #   let the run start), else load_ext. load_before/after
        #   include the bench's OWN 32-thread footprint, so they never
        #   feed the verdict;
        # - steal_pct: hypervisor contention during the loop;
        # - calib divergence: contention that ARRIVED mid-run — the
        #   two single-core calibrations run outside the timed loop
        #   while Spark is idle, so a >20% spread between them is
        #   external by construction (caught a concurrent driver-sim
        #   the load_ext sample predated);
        # - uniform floor inflation (comment above floors parse):
        #   whole-host slowdown — bandwidth/frequency contention —
        #   that every other signal missed on a measured 42 s run.
        "contended": bool(
            (
                busy_ext
                > float(
                    os.environ.get("SPARK_GRAFT_BENCH_QUIET_BUSY_PCT", "8")
                )
                if busy_ext >= 0
                else load_ext > quiet_load
            )
            or steal_pct > 1.0
            or max(calib_before, calib_after)
            > 1.2 * max(1e-9, min(calib_before, calib_after))
            or (
                floor_med is not None
                and floor_spread is not None
                and floor_med > 1.25
                and floor_spread < 0.35
            )
        ),
    }

    extras = {}
    try:
        extras = _ann_split_bench(spark, sf_dir)
    except Exception as exc:  # the split is informational, never fatal
        print(f"bench: ann split bench failed: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Detailed line FIRST (methodology series: the one-shot timings),
    # compact parseable line LAST. Round-5 postmortem: with 50 queries ×
    # two timing dicts the single line outgrew the driver's tail-capture
    # window, truncating the FRONT — where "value" sat — so BENCH_r05
    # recorded `parsed: null`. The driver reads the tail, so the final
    # line carries everything it grades (metric/value/queries/sf) and
    # nothing else (~1.3 KB for 50 queries, well inside the window).
    print(
        json.dumps(
            {
                "metric": "headline_queries_first_run",
                "value": round(sum(first.values()), 3),
                "unit": "sec",
                "queries_first": first,
                "sf": sf_val,
            }
        )
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "machine": machine,
    }
    if extras:
        out["extras"] = extras
    print(json.dumps(out))
    spark.stop()


def _ann_split_bench(spark, sf_dir: str) -> dict[str, float]:
    """Build-at-ingest vs search-only split for the ANN stack
    (operators/annindex.py) — the production cost model q_ivf_topk's
    graded entry cannot show, because its oracle replays training and so
    the graded query must train inline. Phases, each timed separately
    with the same noop-write materialization as the main loop:

    - ivf_train: k-means training + versioned centroid persist (once
      per corpus snapshot at 100 TB, amortized over every query);
    - ivf_assign / lsh_bucket: the ingest-time serving-column
      materialization, written to parquet like a real stored table;
    - ivf_search / lsh_search: a top-k query against the LOADED index
      and the stored serving columns — the per-query cost, min of 2.
    """
    import tempfile

    from pyspark.sql import functions as F

    from etl_sber_spark.operators import annindex as ai
    from etl_sber_spark.operators import similarity as sim
    from etl_sber_spark.sinks.warehouse import Warehouse

    res: dict[str, float] = {}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_dims = 64
    with tempfile.TemporaryDirectory() as tmp:
        wh = Warehouse(spark, f"{tmp}/wh")

        t0 = time.perf_counter()
        cents = ai.train_ivf_index(emb, n_lists=8, n_iter=3)
        ai.save_ivf_index(wh, cents)
        ai.save_lsh_model(wh, n_dims)
        res["ivf_train"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        ai.materialize_ivf_assignments(emb, cents).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_ivf")
        res["ivf_assign"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        ai.materialize_lsh_buckets(emb, n_dims).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_lsh")
        res["lsh_bucket"] = round(time.perf_counter() - t0, 3)

        loaded = ai.load_ivf_index(wh)
        lsh_dims = ai.load_lsh_model(wh).n_dims
        stored_ivf = spark.read.parquet(f"{tmp}/emb_ivf")
        stored_lsh = spark.read.parquet(f"{tmp}/emb_lsh")

        # SemDeDup float vs stored-SQ8 (r8): the pair stage + grouping
        # over the same stored serving columns — the byte/fold win
        # SCALE.md measures at 100k, tracked here at sf scale
        from etl_sber_spark.operators.quantize import quantize_embeddings
        from etl_sber_spark.operators.semdedup import (
            semdedup_serving,
            semantic_pairs,
        )

        quantize_embeddings(
            stored_ivf, keep_original=True, norm_col="q_norm"
        ).write.mode("overwrite").parquet(f"{tmp}/emb_serving")
        serving = spark.read.parquet(f"{tmp}/emb_serving")
        for key, build in (
            (
                "semdedup_pairs_float",
                lambda: semantic_pairs(serving, 0.95),
            ),
            (
                "semdedup_pairs_sq8",
                lambda: semantic_pairs(
                    serving, 0.95, qvec_col="qvec", qnorm_col="q_norm"
                ),
            ),
            (
                "semdedup_serving_full",
                lambda: semdedup_serving(
                    serving.drop("embedding"), loaded, threshold=0.95
                ),
            ),
        ):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            res[key] = round(time.perf_counter() - t0, 3)
        queries = emb.filter(F.col("vec_id") < 5)
        for key, build in (
            (
                "ivf_search",
                lambda: sim.cosine_topk_ivf(
                    stored_ivf,
                    queries,
                    k=3,
                    centroids=loaded,
                    centroid_col="centroid_id",
                ),
            ),
            (
                "lsh_search",
                lambda: sim.cosine_topk_lsh(
                    stored_lsh,
                    queries,
                    lsh_dims,
                    k=3,
                    n_probe=2,
                    bucket_col="bucket",
                ),
            ),
        ):
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            res[key] = min(runs)
    return res


if __name__ == "__main__":
    main()
