"""Cron/ops-shaped CLI for the persisted ANN index lifecycle.

Three subcommands mirror how a 100 TB deployment actually serves
similarity search (operators/annindex.py, streaming/vectors.py):

``build``
    Train the IVF quantizer on a parquet embeddings snapshot (hash-
    sampled via ``--train-mod`` at scale), persist BOTH versioned
    artifacts (centroids + LSH planes), and bootstrap the serving
    table with the snapshot's serving columns (batch_id = -1
    partition — re-running build overwrites exactly that partition, so
    bootstrap is idempotent and never clobbers streamed appends).
    ``--sq8`` additionally stores int8-quantized columns
    (qvec/q_scale/q_norm) next to the float vectors; the ingest stream
    detects them and keeps streamed batches schema-consistent, and
    ``search --method ivf-sq8`` then scans ¼ the vector bytes.
    ``--n-tables L`` builds L independent LSH plane sets (classic
    multi-table LSH, the recall lever where multi-probe saturates —
    SCALE.md: L=4 recall .995 at 100k vectors) and materializes one
    stored bucket column per table; ingest and ``search --method lsh``
    follow the stored model's width automatically.

``ingest``
    Drain a JSONL vector inbox as ONE availableNow pass of
    ``stream_vector_ingest`` — new vectors join the serving table
    assigned against the FROZEN artifacts (no retraining; a drifted
    LSH artifact fails at start).

``compact``
    Maintenance rewrite of the serving table into the
    centroid_id-partitioned read layout
    (``annindex.cluster_serving_table`` — latest batch wins per id,
    probe joins then prune scanned files to the probed lists).

``search``
    Top-k neighbors for serving-table vectors by id, via the
    search-only paths (``centroids=``/``centroid_col=``,
    ``bucket_col=``) — zero training jobs; reads the canonical serving
    view (``annindex.read_serving``): the compacted layout when it
    exists, topped up with batches streamed after its watermark —
    compaction is a read-layout optimization, never a freshness
    cliff. Prints one JSON line with the result rows.

``status``
    Drift/health report (``annindex.ann_status``): version-stamp
    checks, stored-vs-current assignment mismatch fraction, mean
    assignment distance vs the build-time baseline, a sampled recall
    probe, and compaction lag — rolled into one ``recommendation``
    (ok / recompact / retrain / rebuild). The retrain trigger for the
    maintenance cron.

``restamp``
    Derive per-rung probe baselines for an EXISTING artifact from the
    current serving corpus (``annindex.restamp_probe_baselines``) —
    the upgrade path that gives a pre-r8 index ``status --sample-mod
    auto`` comparability without a retrain. Metadata-only: no version
    bump, so serving bindings and compacted layouts stay valid; the
    drift reference re-anchors to the corpus as of the restamp.

Example::

    python -m etl_sber_spark.ann_cli build \
        --embeddings /data/embeddings.parquet --warehouse /data/ann_wh
    python -m etl_sber_spark.ann_cli ingest \
        --inbox /data/vec_inbox --warehouse /data/ann_wh
    python -m etl_sber_spark.ann_cli search \
        --warehouse /data/ann_wh --query-ids 1,2,3 --k 10 --method ivf
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="python -m etl_sber_spark.ann_cli",
        description="Build / ingest / search the persisted ANN index.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="train + persist index, bootstrap serving table")
    b.add_argument("--embeddings", required=True, help="parquet embeddings snapshot")
    b.add_argument("--warehouse", required=True)
    b.add_argument("--n-lists", type=int, default=64)
    b.add_argument("--n-iter", type=int, default=3)
    b.add_argument(
        "--n-tables",
        type=int,
        default=1,
        help="independent LSH plane sets (classic multi-table LSH) — "
        "the recall lever where multi-probe saturates; serving gains "
        "one stored bucket column per table and `search --method lsh` "
        "follows the stored model's width automatically (L=4 measured "
        "recall .995 in SCALE.md)",
    )
    b.add_argument(
        "--train-mod",
        type=int,
        default=None,
        help="train on the deterministic ~1/m hash sample (100 TB default)",
    )
    b.add_argument(
        "--sq8",
        action="store_true",
        help="additionally store int8-quantized serving columns "
        "(qvec/q_scale/q_norm) — search with --method ivf-sq8 reads "
        "1/4 the vector bytes",
    )

    i = sub.add_parser("ingest", help="drain a JSONL vector inbox into the serving table")
    i.add_argument("--inbox", required=True)
    i.add_argument("--warehouse", required=True)
    i.add_argument("--max-files-per-trigger", type=int, default=1)

    c = sub.add_parser(
        "compact", help="rewrite the serving table list-partitioned"
    )
    c.add_argument("--warehouse", required=True)

    st = sub.add_parser(
        "status",
        help="index health / drift report with a retrain recommendation",
    )
    st.add_argument("--warehouse", required=True)
    st.add_argument(
        "--sample-mod",
        type=lambda v: v if v == "auto" else int(v),
        default=16,
        help="probe sample = ~1/mod hash sample; 'auto' picks the "
        "ladder rung targeting --target-sample rows, so probe cost "
        "stays flat as the corpus grows (baselines are stamped per "
        "rung at build)",
    )
    st.add_argument("--target-sample", type=int, default=4096)
    st.add_argument("--recall-queries", type=int, default=8)
    st.add_argument("--n-probe", type=int, default=2)

    rs = sub.add_parser(
        "restamp",
        help="derive per-rung probe baselines for an EXISTING artifact "
        "from the current serving corpus — gives a pre-r8 index "
        "`status --sample-mod auto` comparability without a retrain. "
        "Metadata-only (no version bump, bindings stay valid); the "
        "drift reference re-anchors to the corpus as of the restamp",
    )
    rs.add_argument("--warehouse", required=True)

    def _id_list(v: str) -> list[int]:
        try:
            return [int(x) for x in v.split(",") if x.strip()]
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"--query-ids must be comma-separated integers, got {v!r}"
            )

    s = sub.add_parser("search", help="top-k neighbors for serving-table vectors")
    s.add_argument("--warehouse", required=True)
    s.add_argument(
        "--query-ids",
        required=True,
        type=_id_list,
        help="comma-separated vec_ids",
    )
    s.add_argument("--k", type=int, default=10)
    s.add_argument(
        "--method",
        choices=("ivf", "lsh", "ivf-sq8", "lsh-sq8"),
        default="ivf",
    )
    s.add_argument("--n-probe", type=int, default=2)
    return p.parse_args(argv)


SERVING = "ann_serving"


def reassign_base_cols(columns: list[str]) -> list[str]:
    """The payload columns a rebuild's reassignment carries through:
    everything EXCEPT the serving columns the build rewrites — the LSH
    table layout ("bucket" + "bucket_t<k>"; the fullmatch covers a
    previous build's wider layout when a rebuild shrinks n_tables) and
    the SQ8 triple. NOT a startswith("bucket") prefix match: an
    unrelated payload column like "bucket_count" must ride through the
    reassignment untouched (r7 ADVICE)."""
    derived = {"centroid_id", "qvec", "q_scale", "q_norm"}
    return [
        c
        for c in columns
        if c not in derived
        and c != "bucket"
        and not re.fullmatch(r"bucket_t\d+", c)
    ]


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from .operators import annindex as ai
    from .operators import similarity as sim
    from .session import get_spark
    from .sinks.warehouse import Warehouse

    spark = get_spark("ann-index")
    wh = Warehouse(spark, args.warehouse)

    if args.cmd == "build":
        # refuse BEFORE training: a batch-less serving table (manually
        # assembled — the read paths accept it) cannot be re-assigned
        # per batch partition, and crashing mid-rebuild would flip the
        # artifacts while leaving the table refused by every
        # version-bound read (r8 review)
        if wh.has_data(SERVING) and "batch_id" not in wh.read(SERVING).columns:
            raise SystemExit(
                f"serving table {SERVING!r} has no batch_id column (a "
                "manually assembled layout) — `build` rewrites serving "
                "rows per batch partition and cannot re-assign it; drop "
                "the table (or re-create it batch-partitioned) before "
                "rebuilding"
            )
        emb = spark.read.parquet(args.embeddings)
        # Re-assign any already-streamed batches FIRST, against what
        # will become the new artifacts — a retrain makes every stored
        # centroid_id/bucket stale, and rows assigned under the old
        # quantizer must never be served against the new centroids
        # (r6 ADVICE). build_ann_index trains eagerly, so artifacts are
        # CURRENT once it returns.
        stored = ai.build_ann_index(
            wh,
            emb,
            n_lists=args.n_lists,
            n_iter=args.n_iter,
            train_mod=args.train_mod,
            n_tables=args.n_tables,
        )
        def _sq8(df):
            if not args.sq8:
                return df
            from .operators.quantize import quantize_embeddings

            return quantize_embeddings(
                df, keep_original=True, norm_col="q_norm"
            )

        n_reassigned = 0
        if wh.has_data(SERVING):
            model = ai.load_lsh_model(wh)
            cents = ai.load_ivf_index(wh)
            streamed = wh.read(SERVING).filter(F.col("batch_id") >= 0)
            base_cols = reassign_base_cols(streamed.columns)
            # cut lineage before overwriting the partitions being read
            re_assigned = _sq8(
                ai.materialize_lsh_buckets(
                    ai.materialize_ivf_assignments(
                        streamed.select(*base_cols), cents
                    ),
                    model.n_dims,
                    n_tables=model.n_tables,
                )
            ).localCheckpoint()
            n_reassigned = re_assigned.count()
            if n_reassigned:
                wh.overwrite_partitions(re_assigned, SERVING, ["batch_id"])
        # the compacted read layout snapshots OLD assignments and its
        # watermark would hide the re-bootstrapped batch -1 partition
        ai.invalidate_serving_layout(wh, SERVING)
        wh.overwrite_partitions(
            _sq8(stored).withColumn("batch_id", F.lit(-1)),
            SERVING,
            ["batch_id"],
        )
        binding = ai.bind_serving(wh, SERVING)
        out = {
            "built": True,
            "n_vectors": wh.read(SERVING)
            .filter(F.col("batch_id") == -1)
            .count(),
            "n_reassigned": n_reassigned,
            "n_lists": ai.load_ivf_index(wh).count(),
            "ivf_version": binding["ivf_version"],
            "lsh_version": binding["lsh_version"],
            # the width just built — re-loading the model here would
            # redo the full driver-side plane verification purely for
            # the summary line (r8 review)
            "n_tables": args.n_tables,
        }
    elif args.cmd == "ingest":
        from .streaming.vectors import stream_vector_ingest

        q = stream_vector_ingest(
            spark,
            args.inbox,
            wh,
            os.path.join(args.warehouse, "_ann_checkpoint"),
            serving_table=SERVING,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q.awaitTermination()
        # a healthy no-op run (empty inbox, nothing bootstrapped yet)
        # must report zeros, not crash reading an absent table (r8
        # review — the corpus/crawl CLIs already guard this pattern)
        if wh.has_data(SERVING):
            serving = wh.read(SERVING)
            streamed = (
                serving.filter(F.col("batch_id") >= 0).count()
                if "batch_id" in serving.columns
                else 0
            )
            out = {
                "serving_total": serving.count(),
                "streamed_total": streamed,
            }
        else:
            out = {"serving_total": 0, "streamed_total": 0}
    elif args.cmd == "status":
        out = ai.ann_status(
            wh,
            SERVING,
            sample_mod=args.sample_mod,
            target_sample=args.target_sample,
            recall_queries=args.recall_queries,
            n_probe=args.n_probe,
        )
    elif args.cmd == "restamp":
        meta = ai.restamp_probe_baselines(wh, SERVING)
        out = {
            "restamped": True,
            "rungs": sorted(
                (meta.get("probe_baselines") or {}).keys(), key=int
            ),
            "build_mean_assign_dist": meta.get("build_mean_assign_dist"),
            "build_recall_probe": meta.get("build_recall_probe"),
        }
    elif args.cmd == "compact":
        out_table = ai.cluster_serving_table(wh, SERVING)
        out = {
            "compacted_to": out_table,
            "n_vectors": wh.read(out_table).count(),
            "n_lists_present": wh.read(out_table)
            .select("centroid_id")
            .distinct()
            .count(),
        }
    else:  # search
        ids = args.query_ids
        serving = ai.read_serving(wh, SERVING)
        # pin the (tiny: len(ids) rows) query frame: the missing-ids
        # collect below plus the search itself would otherwise each
        # re-evaluate the corpus-wide latest-wins serving window just
        # to re-derive these few rows (r8 advice)
        queries = (
            serving.filter(F.col("vec_id").isin(ids))
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)
        )
        # an id absent from the serving table would otherwise just
        # vanish from the output — indistinguishable from "no
        # neighbors" (r8 review); surface it explicitly
        found = {r.vec_id for r in queries.select("vec_id").collect()}
        missing = sorted(set(ids) - found)
        if args.method == "ivf":
            res = sim.cosine_topk_ivf(
                serving,
                queries,
                k=args.k,
                n_probe=args.n_probe,
                centroids=ai.load_ivf_index(wh),
                centroid_col="centroid_id",
            )
        elif args.method == "ivf-sq8":
            if "qvec" not in serving.columns:
                raise SystemExit(
                    "serving table has no stored SQ8 columns — rebuild "
                    "with `build --sq8`"
                )
            res = sim.cosine_topk_ivf(
                serving,
                queries,
                k=args.k,
                n_probe=args.n_probe,
                centroids=ai.load_ivf_index(wh),
                centroid_col="centroid_id",
                qvec_col="qvec",
                scale_col="q_scale",
                qnorm_col="q_norm",
            )
        else:
            if args.method == "lsh-sq8" and "qvec" not in serving.columns:
                raise SystemExit(
                    "serving table has no stored SQ8 columns — rebuild "
                    "with `build --sq8`"
                )
            sq8_kw = (
                dict(qvec_col="qvec", scale_col="q_scale", qnorm_col="q_norm")
                if args.method == "lsh-sq8"
                else {}
            )
            # follow the stored model's width: a build --n-tables L
            # serving table carries L stored bucket columns, and the
            # multi-table posexplode path needs all of them
            model = ai.load_lsh_model(wh)
            res = sim.cosine_topk_lsh(
                serving,
                queries,
                model.n_dims,
                k=args.k,
                n_probe=args.n_probe,
                bucket_col="bucket",
                n_tables=model.n_tables,
                **sq8_kw,
            )
        out = {
            "method": args.method,
            "k": args.k,
            "missing_ids": missing,
            "results": [
                {
                    "query_id": r.query_id,
                    "vec_id": r.vec_id,
                    "sim": r.sim,
                    "rank": r.rank,
                }
                for r in res.orderBy("query_id", "rank").collect()
            ],
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
