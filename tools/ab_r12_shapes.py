#!/usr/bin/env python3
"""Round-12 interleaved A/B: the shapes VERDICT r11 asked to settle.

One Spark session, every variant warmed once, then N interleaved
rounds; min per variant is reported (the repo's same-session
methodology — cross-run deltas on this host are unreadable below ~30%).

Variants:
  ngram:  narrow  = shared pin of shingle_hashes (r11, shipped)
          string  = shared pin of raw 3-gram strings (r11 alternative)
          unshared= r10 shape (minhash builds its own shingles;
                    verify pins its own narrow frame)
  curate: narrow / string (same switch inside curate_corpus)
  dsir:   lazy    = r12 one-DAG model (counts stay a frame)
          eager   = r11 collect + literal-frame broadcast

Usage: python tools/ab_r12_shapes.py [n_rounds] [sf_dir]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from etl_sber_spark.operators import curate as cu
    from etl_sber_spark.operators import dedup as dd
    from etl_sber_spark.operators.materialize import pin
    from etl_sber_spark.session import get_spark
    from etl_sber_spark.sources.tables import load_table

    spark = get_spark("ab-r12")

    def timed(name, build):
        gc.collect()
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    def docs():
        return load_table(spark, sf, "documents")

    # --- ngram variants ---------------------------------------------------
    def ngram_narrow():
        d = docs()
        sh = pin(dd.shingle_hashes(d))
        pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(d, sh=sh))
        return dd.ngram_jaccard(d, pairs, sh=sh)

    def ngram_string():
        d = docs()
        sh = pin(dd.shingles(d))
        pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(d, sh=sh))
        return dd.ngram_jaccard(d, pairs, sh=sh)

    def ngram_unshared():
        d = docs()
        pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(d))
        return dd.ngram_jaccard(d, pairs)

    # --- curate variants (default is string after the r12 revert) ---------
    def curate_string():
        return cu.curate_corpus(docs())

    def curate_narrow():
        orig = cu.shingles
        cu.shingles = dd.shingle_hashes
        try:
            out = cu.curate_corpus(docs())
        finally:
            cu.shingles = orig
        return out

    # --- dsir variants ----------------------------------------------------
    from etl_sber_spark.operators.dsir import hashed_grams

    def dsir_lazy():
        from etl_sber_spark.operators.dsir import importance_weights

        d = docs()
        return importance_weights(
            d, d.filter(F.col("lang") == "en"), n_buckets=256,
            target_within_corpus=True,
        )

    def dsir_eager():
        from pyspark.sql import types as T

        d = docs()
        target = d.filter(F.col("lang") == "en")
        n_buckets = 256
        g_corpus = pin(
            hashed_grams(d, "doc_id", "text", n_buckets, 0).join(
                target.select("doc_id").withColumn("_t", F.lit(1)),
                "doc_id",
                "left",
            )
        )
        rows = (
            g_corpus.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("r"),
                F.sum(F.coalesce(F.col("_t"), F.lit(0))).alias("t"),
            )
            .collect()
        )
        raw = {int(r["bucket"]): int(r["r"]) for r in rows}
        tgt = {int(r["bucket"]): int(r["t"]) for r in rows}
        r_total = sum(raw.values())
        t_total = sum(tgt.values())
        ratio = spark.createDataFrame(
            [(b, raw.get(b, 0), tgt.get(b, 0)) for b in range(n_buckets)],
            "bucket long, r_b long, t_b long",
        )
        bits = F.round(
            F.log2(
                (F.col("t_b") + F.lit(1)).cast("double")
                / F.lit(float(t_total + n_buckets))
            )
            - F.log2(
                (F.col("r_b") + F.lit(1)).cast("double")
                / F.lit(float(r_total + n_buckets))
            ),
            9,
        ).cast(T.DecimalType(28, 9))
        return (
            g_corpus.join(F.broadcast(ratio.withColumn("_bits", bits)), "bucket")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.round(F.sum("_bits").cast("double"), 6).alias("log_weight"),
            )
        )

    def dsir_folded_eager():
        """Folded (doc, bucket, n) pin like the shipped shape, but the
        ratio table still collected + rebuilt as literals (isolates
        'folding' from 'going lazy')."""
        from pyspark.sql import types as T

        d = docs()
        target = d.filter(F.col("lang") == "en")
        n_buckets = 256
        db = pin(
            hashed_grams(d, "doc_id", "text", n_buckets, 0)
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .join(
                target.select("doc_id").withColumn("_t", F.lit(1)),
                "doc_id",
                "left",
            )
        )
        rows = (
            db.groupBy("bucket")
            .agg(
                F.sum("_n").alias("r"),
                F.sum(
                    F.when(F.col("_t") == 1, F.col("_n")).otherwise(F.lit(0))
                ).alias("t"),
            )
            .collect()
        )
        raw = {int(r["bucket"]): int(r["r"]) for r in rows}
        tgt = {int(r["bucket"]): int(r["t"]) for r in rows}
        r_total = sum(raw.values())
        t_total = sum(tgt.values())
        ratio = spark.createDataFrame(
            [(b, raw.get(b, 0), tgt.get(b, 0)) for b in range(n_buckets)],
            "bucket long, r_b long, t_b long",
        )
        bits = F.round(
            F.log2(
                (F.col("t_b") + F.lit(1)).cast("double")
                / F.lit(float(t_total + n_buckets))
            )
            - F.log2(
                (F.col("r_b") + F.lit(1)).cast("double")
                / F.lit(float(r_total + n_buckets))
            ),
            9,
        ).cast(T.DecimalType(16, 9))
        return (
            db.join(F.broadcast(ratio.withColumn("_bits", bits)), "bucket")
            .groupBy("doc_id")
            .agg(
                F.sum("_n").alias("n_grams"),
                F.round(
                    F.sum(
                        F.col("_n").cast(T.DecimalType(12, 0))
                        * F.col("_bits")
                    ).cast("double"),
                    6,
                ).alias("log_weight"),
            )
        )

    variants = {
        "ngram_narrow": ngram_narrow,
        "ngram_string": ngram_string,
        "ngram_unshared": ngram_unshared,
        "curate_narrow": curate_narrow,
        "curate_string": curate_string,
        "dsir_lazy": dsir_lazy,
        "dsir_eager": dsir_eager,
        "dsir_folded_eager": dsir_folded_eager,
    }

    # warmup pass (codegen/JIT; discarded)
    for name, fn in variants.items():
        timed(f"warm:{name}", fn)

    results: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(n_rounds):
        for name, fn in variants.items():
            dt = timed(f"r{r}:{name}", fn)
            results[name].append(round(dt, 3))
            print(f"[r{r}] {name}: {dt:.3f}", file=sys.stderr)

    summary = {
        k: {"min": min(v), "runs": v, "load": round(os.getloadavg()[0], 2)}
        for k, v in results.items()
    }
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
