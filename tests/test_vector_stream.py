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


#: r12 suite tiering (VERDICT r11 #3): multi-trigger vector-ingest streams; ANN build fast-covered by test_annindex/test_quantize.
pytestmark = pytest.mark.slow

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


def _sq8_bootstrap(spark, sf_dir, tmp_path, *, drop=None):
    """An SQ8 serving table the way `ann_cli build --sq8` lays it out,
    optionally with columns dropped to fake a partial/renamed layout."""
    from etl_sber_spark.operators.quantize import quantize_embeddings

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 40)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.build_ann_index(wh, emb, n_lists=4, n_iter=1)
    cents = ai.load_ivf_index(wh)
    model = ai.load_lsh_model(wh)
    boot = quantize_embeddings(
        ai.materialize_lsh_buckets(
            ai.materialize_ivf_assignments(emb, cents), model.n_dims
        ),
        keep_original=True,
        norm_col="q_norm",
    ).withColumn("batch_id", F.lit(-1))
    for c in drop or []:
        boot = boot.drop(c)
    wh.overwrite_partitions(boot, "ann_serving", ["batch_id"])
    ai.bind_serving(wh, "ann_serving")
    return emb, wh


def test_partial_sq8_layout_refused_at_start(spark, sf_dir, tmp_path):
    # a table quantized WITHOUT the stored norm (quantize_embeddings
    # defaults) is a layout this ingest cannot reproduce — refuse at
    # stream start, don't append schema-divergent batches (r7 ADVICE)
    _, wh = _sq8_bootstrap(spark, sf_dir, tmp_path, drop=["q_norm"])
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    with pytest.raises(ValueError, match="partial SQ8 layout"):
        stream_vector_ingest(spark, str(inbox), wh, str(tmp_path / "ckpt"))


def test_sq8_layout_without_float_vector_refused(spark, sf_dir, tmp_path):
    # keep_original=False layouts (float vector dropped) also diverge:
    # the stream appends the float column the stored table lacks
    _, wh = _sq8_bootstrap(spark, sf_dir, tmp_path, drop=["embedding"])
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    with pytest.raises(ValueError, match="partial SQ8 layout"):
        stream_vector_ingest(spark, str(inbox), wh, str(tmp_path / "ckpt"))


def test_full_sq8_layout_streams_quantized_batches(spark, sf_dir, tmp_path):
    emb, wh = _sq8_bootstrap(spark, sf_dir, tmp_path)
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    extra = [
        {"vec_id": 10_000 + i, "embedding": [float(i + 1)] * N_DIMS}
        for i in range(5)
    ]
    _write_jsonl(inbox / "b1.jsonl", extra)
    stream_vector_ingest(
        spark, str(inbox), wh, str(tmp_path / "ckpt")
    ).awaitTermination()
    serving = wh.read("ann_serving")
    streamed = serving.filter(F.col("vec_id") >= 10_000)
    assert streamed.count() == len(extra)
    # streamed rows carry the full SQ8 triple, non-null, and the float
    # vector — schema-identical to the bootstrap partition
    got = streamed.filter(
        F.col("qvec").isNotNull()
        & F.col("q_scale").isNotNull()
        & F.col("q_norm").isNotNull()
        & F.col("embedding").isNotNull()
    )
    assert got.count() == len(extra)
    assert set(serving.columns) == set(
        wh.read("ann_serving").filter(F.col("batch_id") == -1).columns
    )
