"""Export sink (sinks/export.py) + per-stratum cap (sampling.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.sampling import cap_per_stratum, sample_bucket
from etl_sber_spark.sinks.export import export_jsonl, shard_expr
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_export_roundtrip_and_manifest(spark, tmp_path):
    d = load_table(spark, SF_SMALL, "documents").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    out = str(tmp_path / "corpus")
    manifest = export_jsonl(d, out, n_shards=4, token_col="n_tokens")

    assert manifest["n_shards"] == 4
    assert manifest["n_rows"] == d.count()
    assert manifest["n_tokens"] == d.agg(F.sum("n_tokens")).collect()[0][0]
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest

    back = spark.read.json(out)
    assert back.count() == manifest["n_rows"]
    # shard dirs exist and each holds exactly one data file
    for s in manifest["shards"]:
        shard_dir = os.path.join(out, f"shard={s['shard']}")
        files = [f for f in os.listdir(shard_dir) if f.startswith("part-")]
        assert len(files) == 1, (s, files)
        n = spark.read.json(shard_dir).count()
        assert n == s["n_rows"]

    # per-shard counts match the hash assignment (reproducible membership)
    expect = {
        r["shard"]: r["n"]
        for r in d.withColumn("shard", shard_expr("doc_id", 4))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {s["shard"]: s["n_rows"] for s in manifest["shards"]} == {
        i: expect.get(i, 0) for i in range(4)
    }


def test_export_empty_shard_listed(spark, tmp_path):
    d = load_table(spark, SF_SMALL, "documents").limit(1)
    manifest = export_jsonl(d, str(tmp_path / "one"), n_shards=8)
    assert len(manifest["shards"]) == 8
    assert sum(s["n_rows"] for s in manifest["shards"]) == 1
    assert manifest["n_tokens"] is None
    with pytest.raises(ValueError):
        export_jsonl(d, str(tmp_path / "bad"), n_shards=0)
    # empty shards report n_tokens 0 (not None) when token_col is set,
    # so the manifest total stays summable
    m2 = export_jsonl(
        d.withColumn("n_tok", F.lit(7)),
        str(tmp_path / "two"),
        n_shards=8,
        token_col="n_tok",
    )
    assert m2["n_tokens"] == 7
    assert sorted({s["n_tokens"] for s in m2["shards"]}) == [0, 7]


def test_cap_per_stratum(spark):
    d = load_table(spark, SF_SMALL, "documents")
    capped = cap_per_stratum(d, "source", max_rows=10)
    sizes = capped.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    assert sizes.filter(F.col("n") > 10).count() == 0
    # strata smaller than the cap keep everything
    orig = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["source"]: r["n"] for r in sizes.collect()}
    for src, n in orig.items():
        assert kept[src] == min(n, 10)
    # deterministic: kept ids are the hash-rank winners, stable across runs
    a = sorted(r["doc_id"] for r in capped.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_stratum(d, "source", max_rows=10).select("doc_id").collect()
    )
    assert a == b
    # and the winners are exactly the max_rows smallest (bucket, id) per stratum
    ranked = d.select(
        "doc_id", "source", sample_bucket(F.col("doc_id")).alias("bk")
    ).collect()
    by_src: dict[str, list] = {}
    for r in ranked:
        by_src.setdefault(r["source"], []).append((r["bk"], r["doc_id"]))
    expect = sorted(
        doc
        for rows in by_src.values()
        for _, doc in sorted(rows)[:10]
    )
    assert a == expect


def _shard_lines(out: str, shard: int) -> list[str]:
    shard_dir = os.path.join(out, f"shard={shard}")
    files = sorted(f for f in os.listdir(shard_dir) if f.startswith("part-"))
    assert len(files) == 1
    with open(os.path.join(shard_dir, files[0])) as f:
        return [ln for ln in f.read().splitlines() if ln]


def test_export_shuffled_training_order(spark, tmp_path):
    """order='shuffled' permutes within-shard line order by
    hash64(id, order_seed): deterministic, seed-dependent, and
    membership-invariant (same shards, same manifest counts)."""
    from etl_sber_spark.functions.hashing import hash64

    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    a, b, c = (str(tmp_path / k) for k in "abc")
    m_id = export_jsonl(d, a, n_shards=4)
    m_s1 = export_jsonl(d, b, n_shards=4, order="shuffled", order_seed=1)
    m_s2 = export_jsonl(d, c, n_shards=4, order="shuffled", order_seed=2)
    assert m_id["order"] == "id" and m_id["order_seed"] is None
    assert m_s1["order"] == "shuffled" and m_s1["order_seed"] == 1
    # membership is order-independent: identical per-shard counts
    counts = lambda m: [s["n_rows"] for s in m["shards"]]
    assert counts(m_id) == counts(m_s1) == counts(m_s2)

    for shard in range(4):
        ids = lambda path: [
            json.loads(ln)["doc_id"] for ln in _shard_lines(path, shard)
        ]
        id_order, s1_order, s2_order = ids(a), ids(b), ids(c)
        assert sorted(s1_order) == sorted(id_order) == sorted(s2_order)
        assert id_order == sorted(id_order)
        # the expected permutation: sort by (hash64(id, seed), id)
        rank = {
            r["doc_id"]: r["h"]
            for r in d.select(
                "doc_id",
                hash64(F.col("doc_id").cast("string"), 1).alias("h"),
            ).collect()
        }
        assert s1_order == sorted(id_order, key=lambda i: (rank[i], i))
    # different epoch seed -> different global permutation
    all_ids = lambda p: [
        i for sh in range(4) for i in (
            json.loads(ln)["doc_id"] for ln in _shard_lines(p, sh)
        )
    ]
    assert all_ids(b) != all_ids(c)
    # reproducible: same seed re-export is byte-identical per shard
    d2 = str(tmp_path / "b2")
    export_jsonl(d, d2, n_shards=4, order="shuffled", order_seed=1)
    for shard in range(4):
        assert _shard_lines(b, shard) == _shard_lines(d2, shard)
    with pytest.raises(ValueError, match="order"):
        export_jsonl(d, str(tmp_path / "bad2"), n_shards=4, order="random")


def test_export_packed_round_trip(spark, tmp_path):
    """Packed parquet export: typed round-trip, totals conservation,
    full-bin accounting against the materialize_bins contract."""
    from etl_sber_spark.operators.packing import materialize_bins
    from etl_sber_spark.sinks.export import export_packed

    d = load_table(spark, SF_SMALL, "documents")
    budget = 128
    bins = materialize_bins(d, budget=budget, n_buckets=4)
    out = str(tmp_path / "packed")
    manifest = export_packed(bins, out, budget=budget, n_files=4)

    rows = bins.collect()
    assert manifest["n_bins"] == len(rows)
    assert manifest["n_tokens"] == sum(len(r.tokens) for r in rows)
    assert manifest["n_fragments"] == sum(len(r.docs) for r in rows)
    assert manifest["n_full_bins"] == sum(
        1 for r in rows if len(r.tokens) == budget
    )
    # each bucket contributes exactly one non-full tail bin
    assert manifest["n_bins"] - manifest["n_full_bins"] <= 4

    back = spark.read.parquet(out)
    assert back.count() == manifest["n_bins"]
    # arrays and boundary structs survive typed
    r = back.filter(F.size("tokens") == budget).limit(1).collect()[0]
    assert sum(d_.n for d_ in r.docs) == budget
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == manifest

    with pytest.raises(ValueError, match="n_files"):
        export_packed(bins, str(tmp_path / "bad"), budget=budget, n_files=0)


def test_export_manifest_respects_path_scheme(spark, tmp_path):
    """Review regression: the manifest is written through the Hadoop
    FileSystem API of the export path's scheme. With a 'file:/...' URI
    the old driver-local open() either crashed (no such local dir for
    remote schemes) or wrote to a bogus local directory literally named
    'file:...' — AFTER the corpus write had already succeeded."""
    local_dir = tmp_path / "corpus_uri"
    out = "file:" + str(local_dir)
    d = load_table(spark, SF_SMALL, "documents")
    manifest = export_jsonl(d, out, n_shards=2)
    on_disk = json.load(open(local_dir / "manifest.json"))
    assert on_disk == manifest
    assert manifest["n_rows"] == d.count()
    # and nothing was dropped beside a literal 'file:...' directory
    assert not os.path.exists("file:" + str(local_dir))


def test_export_packed_manifest_respects_path_scheme(spark, tmp_path):
    from etl_sber_spark.operators.packing import materialize_bins
    from etl_sber_spark.sinks.export import export_packed

    d = load_table(spark, SF_SMALL, "documents").limit(50)
    bins = materialize_bins(d, budget=64, n_buckets=4)
    local_dir = tmp_path / "packed_uri"
    manifest = export_packed(bins, "file:" + str(local_dir), budget=64, n_files=2)
    on_disk = json.load(open(local_dir / "_manifest.json"))
    assert on_disk == manifest


def test_export_null_ids_counted_not_lost(spark, tmp_path):
    """NULL doc_ids hash to NULL; unguarded they landed in parquet's
    default partition while the manifest's 0..n-1 shard loop never
    counted them — rows on disk a trainer iterating the documented
    shard range never reads (r8 review). They shard to 0 and count."""
    rows = [(1, "a"), (2, "b"), (None, "orphan"), (None, "orphan2")]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path / "corpus")
    manifest = export_jsonl(d, out, n_shards=2)
    assert manifest["n_rows"] == 4
    assert sum(s["n_rows"] for s in manifest["shards"]) == 4
    back = spark.read.json(out)
    assert back.count() == 4
    assert not os.path.isdir(
        os.path.join(out, "shard=__HIVE_DEFAULT_PARTITION__")
    )


def test_manifest_survives_committed_empty_table(spark, tmp_path):
    """warehouse_manifest on a warehouse holding a committed-empty
    table (zero-row partitioned write -> _SUCCESS only): exists() is
    True by design, read() would raise UNABLE_TO_INFER_SCHEMA — the
    manifest must report n_rows 0, not die for every table (r8
    review)."""
    from etl_sber_spark.sinks.warehouse import Warehouse, warehouse_manifest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite_versioned(spark.range(3).toDF("k"), "dim")
    # the committed-empty state exists() documents: _SUCCESS, no footer
    d = os.path.join(str(tmp_path / "wh"), "t_empty")
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert wh.exists("t_empty") and not wh.has_data("t_empty")
    m = {r.table: r for r in warehouse_manifest(wh).collect()}
    assert m["dim"].n_rows == 3
    assert m["t_empty"].n_rows == 0
