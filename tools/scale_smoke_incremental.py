#!/usr/bin/env python3
"""Incremental-curation scale smoke (r9): measure the claim SCALE.md
previously only argued — that ONE curation increment's cost is a
function of the INCREMENT, not of the standing corpus, because the
corpus is represented by its minhash signature index and the
bands(new) ⋈ bands(index) join touches only colliding buckets (with
the hot-bucket thinning cap bounding per-doc fanout).

Protocol: build standing signature indexes of growing size (N× the
sf0.1 documents table, replicated with distinct marker prefixes so
bucket geometry stays realistic rather than degenerate), then run the
IDENTICAL fixed-size increment (one curate_increment call: half
near-dups of indexed docs, half fresh text) against each index and
record wall time + verdict counts. Flat-ish wall across a 10× index
growth = the claim, measured. A planted-boilerplate variant
(--boiler) additionally fills ONE bucket family with k identical docs
to show the thinning cap holding (fanout ≤ N_BANDS × cap regardless
of k).

Deterministic throughout (modular arithmetic, no RNG).

Usage: python tools/scale_smoke_incremental.py [index_factors...]
       (default: 2 10 20 — index sizes 10k/50k/100k signatures)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

INCREMENT_DOCS = 2_000  # fixed per-run increment size (half near-dup)


def boiler_smoke(sizes: list[int]) -> None:
    """`--boiler`: the hot-bucket thinning cap under a pathological
    index — k IDENTICAL boilerplate docs fill one bucket family per
    band, and an increment of 100 more copies must cost the same wall
    at every k (uncapped, each copy would estimate against all k index
    members: N_BANDS × k × 100 pair rows)."""
    import time as _t

    from pyspark.sql import functions as F

    from etl_sber_spark.operators.dedup import minhash_signatures
    from etl_sber_spark.operators.incremental import curate_increment
    from etl_sber_spark.session import get_spark

    spark = get_spark("incremental-boiler-smoke")
    boiler = (
        "terms of service all rights reserved contact us privacy policy "
        "cookie settings about careers press blog help center sitemap"
    )
    inc = spark.range(100).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.lit(boiler).alias("text"),
    ).localCheckpoint()
    out = []
    for k in sizes:
        idx = minhash_signatures(
            spark.range(k).select(
                F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
            )
        ).localCheckpoint()
        idx.count()
        t0 = _t.perf_counter()
        ann, _sigs = curate_increment(inc, idx)
        reasons = {
            r["drop_reason"]: r["count"]
            for r in ann.groupBy("drop_reason").count().collect()
        }
        dt = _t.perf_counter() - t0
        assert reasons == {"index_near_dup": 100}, reasons
        out.append({"index_copies": k, "increment_sec": round(dt, 2)})
        print(f"[boiler k={k}] {out[-1]}", file=sys.stderr)
    print(json.dumps({"boiler": out}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--boiler":
        boiler_smoke(
            [int(a) for a in sys.argv[2:]] or [10_000, 100_000]
        )
        return
    factors = [int(a) for a in sys.argv[1:]] or [2, 10, 20]

    from pyspark.sql import functions as F

    from etl_sber_spark.operators.incremental import curate_increment
    from etl_sber_spark.operators.dedup import minhash_signatures
    from etl_sber_spark.session import get_spark

    spark = get_spark("incremental-smoke")
    d = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint()
    )
    n_base = d.count()

    # the fixed increment, built once: docs 0..999 are one-token-tail
    # variants of base docs (near-dups the INDEX must catch via the
    # estimated-Jaccard path), docs 1000..1999 are GENUINELY fresh —
    # synthetic pseudo-random token streams sharing no 3-gram with any
    # real text (a marker prefix would not do it: prefixing a few
    # tokens keeps Jaccard ~0.9 against the source doc)
    inc = (
        d.filter(F.col("doc_id") < INCREMENT_DOCS)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.when(
                F.col("doc_id") < INCREMENT_DOCS // 2,
                F.concat(F.col("text"), F.lit(" changedtail")),
            )
            .otherwise(
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 80), "
                    "i -> concat('tok', pmod(doc_id * 31 + i * 7, 99730))))"
                )
            )
            .alias("text"),
        )
        .localCheckpoint()
    )
    n_inc = inc.count()

    # untimed warmup: first-run JVM/codegen costs must not be billed to
    # the smallest index's timed row
    warm_idx = minhash_signatures(d.limit(500)).localCheckpoint()
    warm_idx.count()
    a0, k0 = curate_increment(inc, warm_idx)
    a0.groupBy("drop_reason").count().collect()
    k0.count()

    out = {"increment_docs": n_inc, "runs": []}
    for f in factors:
        big = (
            d.select(
                "*",
                F.explode(F.sequence(F.lit(0), F.lit(f - 1))).alias("k"),
            )
            .select(
                (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                # replica 0 keeps the original text (the increment's
                # near-dups estimate against it); k>0 are DISTINCT docs
                # (marker prefix) so the index grows with realistic
                # bucket geometry instead of one giant near-dup family
                F.when(F.col("k") == 0, F.col("text"))
                .otherwise(
                    F.concat(F.lit("corpus"), F.col("k"), F.lit(" "),
                             F.col("text"))
                )
                .alias("text"),
            )
            .repartition(32)
        )
        index = minhash_signatures(big).localCheckpoint()
        n_index = index.count()  # materialize OUTSIDE the timed window

        t0 = time.perf_counter()
        annotated, keeper_sigs = curate_increment(inc, index)
        reasons = {
            r["drop_reason"]: r["count"]
            for r in annotated.groupBy("drop_reason").count().collect()
        }
        n_keep_sigs = keeper_sigs.count()
        dt = time.perf_counter() - t0

        # the maintenance knob (r9): bucket sizes precomputed OUTSIDE
        # the increment (they change only by appends) — the increment
        # then pays no index-wide aggregate
        from etl_sber_spark.operators.incremental import band_bucket_sizes

        sizes = band_bucket_sizes(index).localCheckpoint()
        sizes.count()
        t1 = time.perf_counter()
        ann2, keep2 = curate_increment(inc, index, bucket_sizes=sizes)
        reasons2 = {
            r["drop_reason"]: r["count"]
            for r in ann2.groupBy("drop_reason").count().collect()
        }
        n_keep2 = keep2.count()
        dt2 = time.perf_counter() - t1
        assert (reasons2, n_keep2) == (reasons, n_keep_sigs), (
            reasons2, reasons,
        )
        # the band layout (r10): the index's band rows pre-exploded,
        # bucketed by band_key — built on the maintenance cadence
        # (outside the timed window, like the sizes snapshot); the
        # increment then scans three narrow pre-exploded columns
        # instead of re-reading K signature columns + exploding. Sizes
        # come FROM the band table (no explode there either).
        import tempfile

        from etl_sber_spark.operators.incremental import save_band_index
        from etl_sber_spark.sinks.warehouse import Warehouse

        wh = Warehouse(spark, tempfile.mkdtemp(prefix="incwh_"))
        tbl = f"sig_band_idx_f{f}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        save_band_index(wh, index, name=tbl)
        bands = spark.table(tbl)
        sizes_b = band_bucket_sizes(bands).localCheckpoint()
        sizes_b.count()
        t2 = time.perf_counter()
        ann3, keep3 = curate_increment(
            inc, index, bucket_sizes=sizes_b, index_bands=bands
        )
        reasons3 = {
            r["drop_reason"]: r["count"]
            for r in ann3.groupBy("drop_reason").count().collect()
        }
        n_keep3 = keep3.count()
        dt3 = time.perf_counter() - t2
        assert (reasons3, n_keep3) == (reasons, n_keep_sigs), (
            reasons3, reasons,
        )
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

        row = {
            "index_factor": f,
            "index_sigs": n_index,
            "increment_sec": round(dt, 2),
            "increment_sec_presized": round(dt2, 2),
            "increment_sec_banded": round(dt3, 2),
            "reasons": reasons,
            "keeper_sigs": n_keep_sigs,
        }
        out["runs"].append(row)
        print(f"[factor {f}] {row}", file=sys.stderr)
        # the index must be doing its job: the planted near-dups are
        # caught via the ESTIMATED path at every index size
        assert reasons.get("index_near_dup", 0) >= INCREMENT_DOCS // 2 * 0.9, (
            reasons
        )

    print(json.dumps({"n_base_docs": n_base, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
