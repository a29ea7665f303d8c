"""Training-corpus export: sharded JSONL + manifest.

The last step of a curation pipeline is handing the corpus to a
trainer, and the lingua franca there is sharded JSONL (one document per
line) plus a MANIFEST the data loader can trust without re-scanning:
shard count, per-shard row/token counts, totals. This sink produces
exactly that, Spark-native:

- shard assignment is the portable 60-bit hash of the id
  (functions/hashing.py) mod ``n_shards`` — deterministic, stable as
  the corpus grows, and REPRODUCIBLE: re-exporting the same corpus
  yields byte-identical shard membership (no round-robin, no
  partition-order dependence);
- each shard is written by exactly one task (the pre-write repartition
  keys on the shard value, so all rows of a shard hash to one
  partition) — n_shards output files, no tiny-file explosion;
- the manifest is computed as ONE aggregate over the same frame
  (rows + token sums per shard) — metadata-scale result, written
  driver-side as ``manifest.json`` next to the shards.

At 100 TB: pick n_shards so each shard is ~0.5-4 GiB (trainer-side
streaming granularity); the export is one narrow shuffle (the shard
repartition) and one aggregate — both keyed on the uniform hash, so no
skew. Writing compressed (``compression='gzip'``) trades CPU for the
3-5x text ratio; the manifest records it either way.

Reference parity: the reference's sinks are warehouse INSERTs
(SURVEY.md §2.2); this extends the sink surface for the LLM-pipeline
deliverable (§7.5).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64
from ..operators.materialize import pin


def shard_expr(id_col: str, n_shards: int, seed: int = 0):
    """Deterministic shard id in [0, n_shards) from the row id.

    A NULL id hashes to NULL — unguarded, those rows would land in
    parquet's ``__HIVE_DEFAULT_PARTITION__`` while the manifest's
    0..n-1 shard loop never counts them: rows on disk a trainer
    iterating the documented shard range never reads (r8 review —
    silent row loss on a "successful" export). NULL ids shard to 0
    deterministically instead; id hygiene is curation's job, delivery
    never drops."""
    return F.coalesce(
        F.pmod(hash64(F.col(id_col).cast("string"), seed), F.lit(n_shards)),
        F.lit(0),
    )


def _write_manifest(df: DataFrame, path: str, filename: str, manifest: dict) -> None:
    """Write the manifest through the Hadoop FileSystem API of the
    export path's own scheme, so the root may be any Spark-writable URI
    (s3a://, hdfs://, file:/, bare local path). A driver-local
    ``open()`` only works for bare local paths — and failed AFTER the
    full corpus write had already succeeded, or silently wrote to a
    wrong local directory literally named ``file:/...`` (review
    finding)."""
    jvm = df.sparkSession._jvm
    p = jvm.org.apache.hadoop.fs.Path(path, filename)
    fs = p.getFileSystem(df.sparkSession._jsc.hadoopConfiguration())
    out = fs.create(p, True)  # overwrite, like the shard write itself
    try:
        out.write(
            bytearray(
                json.dumps(manifest, indent=1, sort_keys=True).encode("utf-8")
            )
        )
    finally:
        out.close()


def export_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    compression: str | None = None,
    seed: int = 0,
    order: str = "id",
    order_seed: int = 0,
) -> dict:
    """Write ``df`` as ``n_shards`` JSONL shards under ``path`` and a
    ``manifest.json`` beside them; returns the manifest dict.

    Manifest schema::

        {"n_shards": N, "n_rows": R, "n_tokens": T | null,
         "compression": ..., "order": "id" | "shuffled",
         "order_seed": S | null, "shards": [
            {"shard": i, "n_rows": r_i, "n_tokens": t_i | null}, ...]}

    ``token_col`` (optional) is summed per shard so the trainer can
    budget without scanning. Shards with no rows still appear in the
    manifest with zero counts (the trainer iterates 0..N-1).

    ``order`` is the TRAINING-ORDER contract:

    - ``"id"`` (default) — rows within a shard sort by id; right for
      corpora a human inspects or diffs.
    - ``"shuffled"`` — rows within a shard sort by
      ``hash64(id, order_seed)``: combined with hash-uniform shard
      MEMBERSHIP this yields a deterministic pseudorandom global
      permutation (the standard shuffle-free training order: membership
      breaks up any source/time clustering across shards, the hash sort
      breaks it up within a shard) without any global sort — the write
      plan is identical to the id order, only the sort key changes.
      Re-exporting with a different ``order_seed`` is the per-epoch
      reshuffle: same shard membership, identical per-shard counts and
      totals (only the manifest's ``order_seed`` field differs), a new
      permutation. No RNG anywhere — a given
      (corpus, seed, order_seed) always produces byte-identical shards.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if order not in ("id", "shuffled"):
        raise ValueError(f"order must be 'id' or 'shuffled', got {order!r}")
    # pinned: the manifest aggregate AND the shard write both consume
    # this frame — unpinned, the entire upstream pipeline (typically a
    # full curation/packing chain) would execute twice
    sharded = pin(df.withColumn("shard", shard_expr(id_col, n_shards, seed)))

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    stats = {
        r["shard"]: r for r in sharded.groupBy("shard").agg(*aggs).collect()
    }

    # repartitionByRange, NOT hash repartition: murmur3(shard) % n is
    # not identity, so hash partitioning lands ~1/e of the shard values
    # in colliding partitions — some tasks write 2-3 shards, others
    # none, capping write parallelism well below n_shards. Range
    # partitioning over the dense 0..n-1 shard ids maps ~one shard per
    # task (sampling-based split points on an integer key).
    sort_cols = [F.col("shard")]
    if order == "shuffled":
        # sortWithinPartitions takes expressions, so the order hash is
        # never materialized as a column and never leaks into the JSONL
        sort_cols.append(hash64(F.col(id_col).cast("string"), order_seed))
    sort_cols.append(F.col(id_col))  # total order: hash ties fall back to id
    writer = (
        sharded.repartitionByRange(n_shards, "shard")
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

    shards = []
    for i in range(n_shards):
        r = stats.get(i)
        if token_col is None:
            n_tokens = None
        else:
            # empty shard -> 0 (never None: the manifest totals sum these)
            n_tokens = int(r["n_tokens"]) if r and r["n_tokens"] is not None else 0
        shards.append(
            {
                "shard": i,
                "n_rows": int(r["n_rows"]) if r else 0,
                "n_tokens": n_tokens,
            }
        )
    manifest = {
        "n_shards": n_shards,
        "n_rows": sum(s["n_rows"] for s in shards),
        "n_tokens": (
            sum(s["n_tokens"] for s in shards) if token_col is not None else None
        ),
        "compression": compression,
        "order": order,
        "order_seed": order_seed if order == "shuffled" else None,
        "shards": shards,
    }
    _write_manifest(sharded, path, "manifest.json", manifest)
    return manifest


def export_packed(
    bins: DataFrame,
    path: str,
    budget: int,
    n_files: int = 16,
    compression: str | None = None,
) -> dict:
    """Write packed training sequences (operators/packing.py
    ``materialize_bins`` output: bin_id, tokens, docs) as parquet plus
    a ``manifest.json`` — the tokenized twin of :func:`export_jsonl`.

    Files split by ``pmod(bin_id, n_files)`` (uniform: bin ids are
    dense per bucket), one file per partition — the same
    no-tiny-files discipline as the JSONL export; parquet keeps the
    token arrays and doc-boundary structs typed for the data loader.
    The manifest records totals and the bin-size contract
    (``budget``), all from ONE aggregate. It is written as
    ``_manifest.json`` — the underscore prefix keeps it invisible to
    parquet directory scans (the ``_SUCCESS`` convention), so
    ``spark.read.parquet(path)`` works on the export root.
    """
    if n_files <= 0:
        raise ValueError(f"n_files must be positive, got {n_files}")
    pinned = pin(bins.withColumn("part", F.pmod(F.col("bin_id"), F.lit(n_files))))
    stats = pinned.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.size("tokens")).alias("n_tokens"),
        F.sum(F.size("docs")).alias("n_fragments"),
        F.sum((F.size("tokens") == budget).cast("long")).alias("n_full_bins"),
    ).collect()[0]
    writer = (
        pinned.repartitionByRange(n_files, "part")
        .sortWithinPartitions("part", "bin_id")
        .write.mode("overwrite")
        .partitionBy("part")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)
    manifest = {
        "format": "packed-parquet",
        "budget": budget,
        "n_files": n_files,
        "n_bins": int(stats["n_bins"]),
        "n_full_bins": int(stats["n_full_bins"]),
        "n_tokens": int(stats["n_tokens"] or 0),
        "n_fragments": int(stats["n_fragments"] or 0),
        "compression": compression,
    }
    _write_manifest(pinned, path, "_manifest.json", manifest)
    return manifest
