"""Streaming ANN serving-table maintenance (streaming/vectors.py):
micro-batches attach serving columns against the FROZEN persisted
index, search parity vs the inline path, crash-replay idempotence,
fail-at-start on a missing artifact."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators import annindex as ai
from etl_sber_spark.operators import similarity as sim
from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.streaming.vectors import stream_vector_ingest

N_DIMS = 64


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _drop_vectors(emb, inbox, split_at):
    rows = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
        for r in emb.collect()
    ]
    _write_jsonl(inbox / "b1.jsonl", [r for r in rows if r["vec_id"] < split_at])
    _write_jsonl(inbox / "b2.jsonl", [r for r in rows if r["vec_id"] >= split_at])
    return len(rows)


def test_stream_builds_serving_table_with_search_parity(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    # bootstrap: train + persist the index on the corpus snapshot
    ai.build_ann_index(wh, emb, n_lists=8, n_iter=2)

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    n = _drop_vectors(emb, inbox, split_at=250)

    q = stream_vector_ingest(
        spark, str(inbox), wh, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination()

    serving = wh.read("ann_serving")
    assert serving.count() == n
    assert serving.select("batch_id").distinct().count() == 2  # one per file

    # serving columns match the inline expressions against the SAME
    # frozen quantizer — the stream introduced no drift
    cents = ai.load_ivf_index(wh)
    expect = emb.select(
        "vec_id",
        sim.nearest_centroids_expr(
            sim.quantize_vec_sql("embedding"), sim._centroid_rows(cents), 1
        )[0].alias("centroid_id"),
        sim.bucket_expr("embedding", N_DIMS).alias("bucket"),
    )
    got = sorted(
        tuple(r) for r in serving.select("vec_id", "centroid_id", "bucket").collect()
    )
    assert got == sorted(tuple(r) for r in expect.collect())

    # a top-k search over the streamed serving table == the inline path
    # over the same vectors with the same loaded quantizer
    queries = emb.filter(F.col("vec_id") < 5)
    via_serving = sim.cosine_topk_ivf(
        serving.drop("batch_id"),
        queries,
        k=3,
        centroids=cents,
        centroid_col="centroid_id",
    )
    inline = sim.cosine_topk_ivf(emb, queries, k=3, centroids=cents)
    assert sorted(tuple(r) for r in via_serving.collect()) == sorted(
        tuple(r) for r in inline.collect()
    )


def test_replay_rewrites_instead_of_duplicating(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 40)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.build_ann_index(wh, emb, n_lists=4, n_iter=1)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    n = _drop_vectors(emb, inbox, split_at=20)

    stream_vector_ingest(
        spark, str(inbox), wh, str(tmp_path / "ckpt")
    ).awaitTermination()
    assert wh.read("ann_serving").count() == n

    # fresh checkpoint => both files replay as batches 0/1; the marker
    # fast-skip + batch_id-partition overwrite keep the table exact
    stream_vector_ingest(
        spark, str(inbox), wh, str(tmp_path / "ckpt2")
    ).awaitTermination()
    serving = wh.read("ann_serving")
    assert serving.count() == n
    assert serving.select("vec_id").distinct().count() == n


def test_missing_index_artifact_fails_at_start(spark, sf_dir, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))  # nothing saved
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    with pytest.raises(Exception):
        stream_vector_ingest(spark, str(inbox), wh, str(tmp_path / "ckpt"))
