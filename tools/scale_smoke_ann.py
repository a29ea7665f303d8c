#!/usr/bin/env python3
"""ANN search-path scale smoke (VERDICT r5 #5): replicate the sf0.1
embeddings table N× with deterministic perturbation, build the
PERSISTED index once (operators/annindex.py — versioned centroids +
serving columns written as a stored parquet table), and measure the
search path against the brute-force oracle:

- recall@k for LSH (n_probe 1/2/4) and IVF (n_probe 1/2/4) vs the
  exact cosine top-k over the same replicated corpus;
- wall time per phase (index build split into train / assign / bucket;
  search timed min-of-2 against the stored serving columns).

The corpus (text) stack has had measured 10×/20×/50× evidence since r5
(tools/scale_smoke_corpus.py / SCALE.md); this closes the same gap for
the vector stack — recall ladders previously existed only at sf0.1
scale (tests/test_ivf.py, tests/test_lsh_multiprobe.py).

Usage:  python tools/scale_smoke_ann.py [factor] [sf_dir]
        (defaults: 10 /root/testdata/sf0.1 — 2,000 rows × factor)

Replication is RNG-free (the repo-wide determinism rule): replica r of
vector v adds (r % 7 − 3) × 0.05 to coordinate (r % n_dims), giving
distinct directions (pure scaling would be cosine-invariant), and new
ids are orig_id + r × 10⁶ so replica 0 keeps the original ids.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

K = 10
N_QUERIES = 20
N_DIMS = 64
ID_SPAN = 1_000_000


def replicate(emb, factor: int):
    from pyspark.sql import functions as F

    r = emb.sparkSession.range(factor).select(F.col("id").alias("_r"))
    return (
        emb.crossJoin(F.broadcast(r))
        .select(
            (F.col("vec_id") + F.col("_r") * ID_SPAN).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, i) -> CAST(x + "
                f"CASE WHEN i = _r % {N_DIMS} "
                f"THEN (_r % 7 - 3) * 0.05 ELSE 0.0 END AS FLOAT))"
            ).alias("embedding"),
        )
    )


def recall_at_k(approx, exact) -> float:
    """Mean fraction of the exact top-K ids recovered per query."""
    from pyspark.sql import functions as F

    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi")
    per_q = hit.groupBy("query_id").agg(F.count("*").alias("n"))
    row = exact.select("query_id").distinct().join(
        per_q, "query_id", "left"
    ).agg(F.avg(F.coalesce(F.col("n"), F.lit(0)) / K).alias("r")).first()
    return round(float(row.r), 3)


def timed_min2(build) -> float:
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    return min(runs)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from etl_sber_spark.operators import annindex as ai
    from etl_sber_spark.operators import similarity as sim
    from etl_sber_spark.session import get_spark
    from etl_sber_spark.sinks.warehouse import Warehouse

    spark = get_spark("ann-scale-smoke")
    out: dict = {"factor": factor, "sf_dir": sf_dir}

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        replicate(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), factor
        ).write.mode("overwrite").parquet(f"{tmp}/emb")
        emb = spark.read.parquet(f"{tmp}/emb")
        out["n_vectors"] = emb.count()
        out["gen_sec"] = round(time.perf_counter() - t0, 3)

        queries = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint()

        # ---- build-at-ingest: train (hash-sampled at scale) + persist +
        # serving columns stored as the parquet table a query would scan
        wh = Warehouse(spark, f"{tmp}/wh")
        n_lists = 64
        train_mod = max(1, factor // 5)  # ~1/m hash sample, the 100 TB path
        t0 = time.perf_counter()
        cents = ai.train_ivf_index(
            emb, n_lists=n_lists, n_iter=3, train_mod=train_mod
        )
        ai.save_ivf_index(wh, cents)
        ai.save_lsh_model(wh, N_DIMS)
        out["ivf_train_sec"] = round(time.perf_counter() - t0, 3)
        out["ivf_train_mod"] = train_mod
        out["n_lists"] = n_lists

        t0 = time.perf_counter()
        ai.materialize_ivf_assignments(emb, cents).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_ivf")
        out["ivf_assign_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        ai.materialize_lsh_buckets(emb, N_DIMS).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_lsh")
        out["lsh_bucket_sec"] = round(time.perf_counter() - t0, 3)
        # per-table stored columns for multi-table serving (r7): one
        # extra projection per table at ingest, L-1 extra int columns
        t0 = time.perf_counter()
        ai.save_lsh_model(wh, N_DIMS, name="lsh_multi", n_tables=4)
        ai.materialize_lsh_buckets(emb, N_DIMS, n_tables=4).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_lsh4")
        out["lsh_bucket_t4_sec"] = round(time.perf_counter() - t0, 3)

        loaded = ai.load_ivf_index(wh)
        stored_ivf = spark.read.parquet(f"{tmp}/emb_ivf")
        stored_lsh = spark.read.parquet(f"{tmp}/emb_lsh")

        # ---- brute-force oracle (exact top-K; also the latency baseline)
        t0 = time.perf_counter()
        exact = sim.cosine_topk_bruteforce(
            emb, queries, k=K
        ).localCheckpoint()
        exact.count()
        out["bruteforce_sec"] = round(time.perf_counter() - t0, 3)

        # ---- search-only ladders against the stored serving columns
        for probes in (1, 2, 4):
            approx = sim.cosine_topk_lsh(
                stored_lsh, queries, N_DIMS, k=K, n_probe=probes,
                bucket_col="bucket",
            )
            out[f"lsh_p{probes}_sec"] = timed_min2(
                lambda a=approx: a
            )
            out[f"lsh_p{probes}_recall"] = recall_at_k(approx, exact)
        for probes in (1, 2, 4):
            approx = sim.cosine_topk_ivf(
                stored_ivf, queries, k=K, n_probe=probes,
                centroids=loaded, centroid_col="centroid_id",
            )
            out[f"ivf_p{probes}_sec"] = timed_min2(
                lambda a=approx: a
            )
            out[f"ivf_p{probes}_recall"] = recall_at_k(approx, exact)
        # multi-table LSH ladder, SEARCH-ONLY (r7): per-table stored
        # bucket columns (wide layout), drift-guarded planes, candidate
        # explode over stored ints — zero corpus-side plane math
        model = ai.load_lsh_model(wh, name="lsh_multi")
        stored_lsh4 = spark.read.parquet(f"{tmp}/emb_lsh4")
        for n_tables in (2, 4):
            approx = sim.cosine_topk_lsh(
                stored_lsh4, queries, model.n_dims, k=K, n_probe=1,
                bucket_col="bucket", n_tables=n_tables,
            )
            out[f"lsh_t{n_tables}_sec"] = timed_min2(lambda a=approx: a)
            out[f"lsh_t{n_tables}_recall"] = recall_at_k(approx, exact)

        # stored-SQ8 serving (r7): quantize at ingest, DROP the float
        # column — measure bytes on disk + search latency/recall of the
        # all-integer scoring path against the same exact oracle
        from etl_sber_spark.operators.quantize import quantize_embeddings

        t0 = time.perf_counter()
        quantize_embeddings(stored_ivf, norm_col="q_norm").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/emb_sq8")
        out["sq8_materialize_sec"] = round(time.perf_counter() - t0, 3)

        def _dir_bytes(d: str) -> int:
            return sum(
                os.path.getsize(os.path.join(base, f))
                for base, _, files in os.walk(d)
                for f in files
                if not f.startswith(("_", "."))
            )

        out["float_table_mb"] = round(_dir_bytes(f"{tmp}/emb_ivf") / 1e6, 1)
        out["sq8_table_mb"] = round(_dir_bytes(f"{tmp}/emb_sq8") / 1e6, 1)
        stored_sq8 = spark.read.parquet(f"{tmp}/emb_sq8")
        approx = sim.cosine_topk_ivf(
            stored_sq8, queries, k=K, n_probe=2,
            centroids=loaded, centroid_col="centroid_id",
            qvec_col="qvec", scale_col="q_scale", qnorm_col="q_norm",
        )
        out["sq8_p2_sec"] = timed_min2(lambda a=approx: a)
        out["sq8_p2_recall"] = recall_at_k(approx, exact)

        # drift-monitor latency (the status probe is sample-bounded)
        wh.overwrite_partitions(
            stored_ivf.join(
                stored_lsh.select("vec_id", "bucket"), "vec_id"
            ).withColumn("batch_id", F.lit(-1)),
            "ann_serving",
            ["batch_id"],
        )
        ai.bind_serving(wh)
        t0 = time.perf_counter()
        st = ai.ann_status(wh)
        out["status_sec"] = round(time.perf_counter() - t0, 3)
        out["status_recommendation"] = st["recommendation"]
        out["status_n_sampled"] = st["n_sampled"]
        # auto mode (r7 verdict #4): fixed target sample SIZE — the
        # rung rises with the corpus, so probe cost stays ~flat where
        # the fixed-mod probe above grows linearly with it
        t0 = time.perf_counter()
        st_auto = ai.ann_status(wh, sample_mod="auto", target_sample=2048)
        out["status_auto_sec"] = round(time.perf_counter() - t0, 3)
        out["status_auto_mod"] = st_auto["sample_mod"]
        out["status_auto_n_sampled"] = st_auto["n_sampled"]

        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
