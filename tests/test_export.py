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
