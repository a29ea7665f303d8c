"""Edge-case regressions from the round-3 operator review: SCD1 append
growth, as-of NULL payloads, empty k-means training sets, zero-token
packing, and the shared-schema mutation in build_mart."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from etl_sber_spark.operators.asof import asof_join
from etl_sber_spark.operators.packing import pack_documents
from etl_sber_spark.operators.scd import scd1_append, scd1_latest
from etl_sber_spark.operators.similarity import kmeans_centroids


def test_scd1_append_does_not_regrow_unchanged_rows(spark):
    """Once a key has two historical versions, an UNCHANGED staging row
    must append NOTHING — the literal reference diff (inner join where
    any attr differs) matched the stale old version and re-appended the
    current row every run, growing the fact without bound."""
    fact = spark.createDataFrame(
        [("P1", dt.date(2021, 3, 1)), ("P1", dt.date(2021, 3, 5))],
        "passport_num string, entry_dt date",
    )
    stg = spark.createDataFrame(
        [("P1", dt.date(2021, 3, 5))], "passport_num string, entry_dt date"
    )
    delta = scd1_append(fact, stg, "passport_num", ["entry_dt"])
    assert delta.count() == 0
    # a genuinely NEW version still appends exactly once (not once per
    # differing old version)
    stg2 = spark.createDataFrame(
        [("P1", dt.date(2021, 3, 9))], "passport_num string, entry_dt date"
    )
    delta2 = scd1_append(fact, stg2, "passport_num", ["entry_dt"]).collect()
    assert [(r.passport_num, r.entry_dt) for r in delta2] == [
        ("P1", dt.date(2021, 3, 9))
    ]


def test_scd1_append_null_safe_exact_match(spark):
    """A staged row identical to a fact row except both attrs are NULL
    counts as already-present (eqNullSafe), not as a new version."""
    fact = spark.createDataFrame(
        [("P1", None)], "passport_num string, note string"
    )
    stg = spark.createDataFrame(
        [("P1", None)], "passport_num string, note string"
    )
    assert scd1_append(fact, stg, "passport_num", ["note"]).count() == 0


def test_asof_join_returns_matched_rows_nulls_not_stale_values(spark):
    """The matched (latest preceding) right row's NULL attribute must
    surface as NULL — per-column last(ignorenulls) substituted a stale
    value from an OLDER right row, producing an output row whose
    columns came from different source rows (DuckDB's native ASOF, the
    q_asof_join oracle, keeps the matched row's NULLs)."""
    right = spark.createDataFrame(
        [
            ("k", dt.datetime(2021, 3, 1, 10, 0), 5.0, "a"),
            ("k", dt.datetime(2021, 3, 1, 11, 0), None, "b"),
        ],
        "key string, ts timestamp, price double, tag string",
    )
    left = spark.createDataFrame(
        [("k", dt.datetime(2021, 3, 1, 12, 0))], "key string, ts timestamp"
    )
    out = asof_join(left, right, "key", "ts", ["price", "tag"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.ts_right == dt.datetime(2021, 3, 1, 11, 0)  # matched 11:00 row
    assert r.price_right is None  # NOT the stale 5.0 from 10:00
    assert r.tag_right == "b"


def test_kmeans_empty_training_set_raises_cleanly(spark):
    e = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="training set is empty"):
        kmeans_centroids(e, k=4)


def test_packing_zero_token_doc_never_spans(spark):
    """A zero-token document occupies nothing: spans_bins must be False
    even at an exact bin boundary (including the very first slot of a
    bucket, where cum_before = 0 made floor(-1/budget) = -1)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "a b c d"), (3, "   ")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in pack_documents(docs, budget=4, n_buckets=1).collect()
    }
    assert out[1].n_tokens == 0 and out[1].spans_bins is False
    assert out[3].n_tokens == 0 and out[3].spans_bins is False
    assert out[2].n_tokens == 4 and out[2].spans_bins is False


def test_build_mart_does_not_mutate_shared_schema(spark, tmp_path):
    """build_mart's zero-fact fallback schema must be a COPY:
    StructType.add mutates the module-level FACT_TRANSACTIONS in place,
    so a second zero-fact day in one process saw duplicate load_date
    columns."""
    from etl_sber_spark import schemas
    from etl_sber_spark.pipeline import build_mart
    from etl_sber_spark.sinks.warehouse import Warehouse

    from .fixtures_bank import build_bank_tables

    n_fields = len(schemas.FACT_TRANSACTIONS.fields)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bank = build_bank_tables(spark)
    ts = dt.datetime(2021, 3, 1, 23, 59, 59)
    for _ in range(2):  # the SECOND zero-fact day used to break
        build_mart(wh, bank, ts)
    assert len(schemas.FACT_TRANSACTIONS.fields) == n_fields


def test_topk_operators_survive_zero_norm_embeddings(spark):
    """Review regression: cosine_similarity used a plain `/`, which
    raises DIVIDE_BY_ZERO under Spark 4's default ANSI mode the moment
    one embedding has zero norm (a routine artifact of failed embedding
    calls). The guarded form yields NULL, which sorts last under DESC —
    broken embeddings never crash the job and never enter a top-k."""
    from etl_sber_spark.functions.vectors import cosine_similarity
    from etl_sber_spark.operators.similarity import (
        cosine_topk_bruteforce,
        embedding_neardup_pairs,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: failed embedding call
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    sim = (
        emb.alias("a")
        .crossJoin(emb.alias("b"))
        .select(
            cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("s")
        )
    )
    # 7 of 16 ordered pairs touch the zero vector -> NULL, none raise
    assert sim.filter(F.col("s").isNull()).count() == 7

    topk = cosine_topk_bruteforce(emb, emb.filter("vec_id = 1"), k=3)
    got = [r.vec_id for r in topk.orderBy("rank").collect()]
    # the zero vector ranks LAST (NULL sim), after every real similarity
    assert got == [2, 4, 3]
    assert topk.filter("vec_id = 3").collect()[0].sim is None

    # the pairwise near-dup sweep must not crash either; zero vectors
    # simply never reach any >= threshold
    pairs = embedding_neardup_pairs(emb, n_dims=4, threshold=0.5)
    ids = {x for r in pairs.collect() for x in (r.id_a, r.id_b)}
    assert 3 not in ids
