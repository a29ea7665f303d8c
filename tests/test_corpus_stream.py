"""JSONL corpus reader (sources/corpus.py) + the landing-zone stream
(streaming/corpus.py): quarantine split, incremental dedup vs the
persisted index across micro-batches, crash-replay idempotence."""

from __future__ import annotations

import pytest

import json
from pathlib import Path

from pyspark.sql import functions as F

from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.sources.corpus import read_documents_jsonl
from etl_sber_spark.streaming.corpus import stream_corpus_increments

from .test_incremental import BASE, BASE2, UNRELATED



#: r12 suite tiering (VERDICT r11 #3): multi-trigger corpus ingest streams; the foreachBatch bodies (curate/dedup operators) are fast-covered by test_curate/test_crawl.
pytestmark = pytest.mark.slow

def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")


def test_reader_splits_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop1.jsonl"
    _write_jsonl(
        p,
        [
            {"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"},
            '{"doc_id": 2, "text": "broken json...',  # unparseable
            {"doc_id": None, "text": "no id", "lang": "en", "source": "a"},
            {"doc_id": 4, "text": None, "lang": "en", "source": "a"},
            {"doc_id": 5, "text": "ok", "lang": None, "source": None},
        ],
    )
    good, bad = read_documents_jsonl(spark, str(p))
    g = {r.doc_id: r for r in good.collect()}
    # optional columns may be NULL; required ones may not
    assert set(g) == {1, 5}
    assert g[1].n_chars == 11
    b = sorted((r.reason, r.raw) for r in bad.collect())
    assert [r for r, _ in b] == ["missing:doc_id", "missing:text", "unparseable"]
    assert '"broken json' in dict((r, raw) for r, raw in b)["unparseable"]


def test_stream_increments_dedupe_against_grown_index(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct docs
    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "text": BASE, "lang": "en", "source": "a"},
            {"doc_id": 2, "text": UNRELATED, "lang": "en", "source": "a"},
        ],
    )
    q = stream_corpus_increments(spark, str(inbox), wh, ckpt)
    q.awaitTermination(120)

    curated = wh.read("curated_docs")
    assert curated.count() == 2
    assert curated.filter(F.col("drop_reason").isNotNull()).count() == 0
    assert wh.read("minhash_index").count() == 2

    # batch 2: near-dup of doc 1 (one-word variant), one new doc, and a
    # malformed line -> the near-dup must be caught via the INDEX (its
    # text was never retained), the new doc indexed, the bad line
    # quarantined
    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {
                "doc_id": 11,
                "text": BASE.replace("lazy", "sleepy"),
                "lang": "en",
                "source": "a",
            },
            {"doc_id": 12, "text": BASE2, "lang": "en", "source": "a"},
            "not json at all {{{",
        ],
    )
    q = stream_corpus_increments(spark, str(inbox), wh, ckpt)
    q.awaitTermination(120)

    curated = wh.read("curated_docs")
    assert curated.count() == 4
    reasons = {r.doc_id: r.drop_reason for r in curated.collect()}
    assert reasons[11] == "index_near_dup"
    assert reasons[12] is None
    # index grew by exactly the keeper
    assert wh.read("minhash_index").count() == 3
    quar = wh.read("corpus_quarantine").collect()
    assert len(quar) == 1 and quar[0].reason == "unparseable"

    # re-running with a drained inbox is a no-op (exactly-once per file)
    q = stream_corpus_increments(spark, str(inbox), wh, ckpt)
    q.awaitTermination(120)
    assert wh.read("curated_docs").count() == 4
    assert wh.read("minhash_index").count() == 3


def test_batch_marker_makes_replay_idempotent(spark, tmp_path):
    """Simulate foreachBatch crash-replay: applying the same batch id
    twice must not duplicate curated rows or index signatures."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _write_jsonl(
        inbox / "b1.jsonl",
        [{"doc_id": 1, "text": BASE, "lang": "en", "source": "a"}],
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_corpus_increments(spark, str(inbox), wh, ckpt)
    q.awaitTermination(120)
    assert wh.read("curated_docs").count() == 1

    # replay batch 0: a fresh checkpoint over the same inbox re-delivers
    # the file as batch 0 against the SAME warehouse — the marker must
    # short-circuit the appends
    q = stream_corpus_increments(spark, str(inbox), wh, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    assert wh.read("curated_docs").count() == 1
    assert wh.read("minhash_index").count() == 1

    # crash-BETWEEN-writes replay: data partitions written but the
    # marker was not (crash just before it) — dropping the marker and
    # re-delivering batch 0 re-RUNS the writes; partition overwrite
    # must leave counts unchanged (an append formulation would double
    # every row — the round-3 review finding)
    wh.drop("curated_docs__applied_batches")
    q = stream_corpus_increments(spark, str(inbox), wh, str(tmp_path / "ckpt3"))
    q.awaitTermination(120)
    rows = wh.read("curated_docs").collect()
    assert len(rows) == 1
    # count alone would hide the self-match corruption: a replay that
    # reads its OWN index partition would re-mark the doc as a
    # near-dup of itself (drop_reason set) while counts stay 1 —
    # read_index_excluding (streaming/idempotent.py) prevents it
    assert rows[0].drop_reason is None
    assert wh.read("minhash_index").count() == 1


def test_corpus_cli_subprocess(tmp_path):
    """The cron-shaped corpus CLI: two invocations over a growing inbox
    behave as two increments (same engine as the in-process stream)."""
    import subprocess
    import sys

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh_dir = str(tmp_path / "wh")
    _write_jsonl(
        inbox / "b1.jsonl",
        [{"doc_id": 1, "text": BASE, "lang": "en", "source": "a"}],
    )

    def run():
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "etl_sber_spark.corpus_cli",
                "--inbox",
                str(inbox),
                "--warehouse",
                wh_dir,
            ],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
            timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    r1 = run()
    assert (r1["curated_total"], r1["kept_total"], r1["index_size"]) == (1, 1, 1)

    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {
                "doc_id": 2,
                "text": BASE.replace("dawn", "dusk"),
                "lang": "en",
                "source": "a",
            }
        ],
    )
    r2 = run()
    # the near-dup of the indexed doc is dropped; index unchanged
    assert (r2["curated_total"], r2["kept_total"], r2["dropped_total"]) == (2, 1, 1)
    assert r2["index_size"] == 1


def _topic_encoder(texts):
    """Test encoder: the vector depends ONLY on the first word, so
    same-topic texts are semantically identical (cosine 1) while being
    lexically distinct — the planted-semantic-dup shape the md5 stub
    cannot produce (it maps distinct texts to independent vectors)."""
    import hashlib

    out = []
    for t in texts:
        d = hashlib.md5(t.split()[0].lower().encode()).digest()
        out.append([float(d[i]) + 1.0 for i in range(4)])
    return out


def test_stream_semantic_stage_dedupes_lexical_survivors(spark, tmp_path):
    """centroids= adds the semantic stage: lexically-distinct same-topic
    docs drop as batch/index semantic dups, are excluded from the
    minhash index, and keepers grow the persisted semantic index."""
    from etl_sber_spark.operators.similarity import kmeans_centroids

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    seed = spark.createDataFrame(
        [
            (i, _topic_encoder([w])[0])
            for i, w in enumerate(["apple", "banana", "cherry", "durian"])
        ],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(seed, k=2).localCheckpoint(eager=True)

    def run():
        q = stream_corpus_increments(
            spark,
            str(inbox),
            wh,
            ckpt,
            centroids=cents,
            semantic_threshold=0.999,
            encoder=_topic_encoder,
        )
        q.awaitTermination(120)

    # batch 1: docs 1/3 share a topic (lexically distinct) -> 3 drops
    # in-batch; doc 2 is its own topic
    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "text": "apple pie with cinnamon and sugar",
             "lang": "en", "source": "a"},
            {"doc_id": 2, "text": "banana bread with walnuts and honey",
             "lang": "en", "source": "a"},
            {"doc_id": 3, "text": "apple strudel layered with raisins folded",
             "lang": "en", "source": "a"},
        ],
    )
    run()
    got = {r.doc_id: r.drop_reason for r in wh.read("curated_docs").collect()}
    assert got == {1: None, 2: None, 3: "batch_semantic_dup"}
    assert sorted(
        r.doc_id for r in wh.read("minhash_index").collect()
    ) == [1, 2]
    assert sorted(
        r.doc_id for r in wh.read("semantic_index").collect()
    ) == [1, 2]

    # batch 2: doc 11 re-visits the apple topic (vs the INDEX — doc 1's
    # text is long gone), doc 12 is a new topic and survives
    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {"doc_id": 11, "text": "apple crumble topped with oats baked",
             "lang": "en", "source": "a"},
            {"doc_id": 12, "text": "cherry clafoutis dusted with sugar powder",
             "lang": "en", "source": "a"},
        ],
    )
    run()
    got = {r.doc_id: r.drop_reason for r in wh.read("curated_docs").collect()}
    assert got[11] == "index_semantic_dup"
    assert got[12] is None
    assert sorted(
        r.doc_id for r in wh.read("minhash_index").collect()
    ) == [1, 2, 12]
    assert sorted(
        r.doc_id for r in wh.read("semantic_index").collect()
    ) == [1, 2, 12]


def test_bootstrap_semantic_index_from_ann_serving(spark, tmp_path):
    """r9: a standing ANN serving table (stored centroid_id + SQ8
    columns) seeds the semantic index directly — no re-embedding pass —
    and the FIRST stream batch already dedupes against it
    (index_semantic_dup), with the bootstrap partition surviving
    read_index_excluding for every real batch id."""
    from etl_sber_spark.operators.annindex import materialize_ivf_assignments
    from etl_sber_spark.operators.quantize import quantize_embeddings
    from etl_sber_spark.operators.semindex import (
        BOOTSTRAP_BATCH_ID,
        bootstrap_semantic_index,
    )
    from etl_sber_spark.operators.similarity import kmeans_centroids

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # the standing ANN corpus: apple + banana topics, served as
    # centroid_id + SQ8 (float column dropped — the serving layout)
    corpus = spark.createDataFrame(
        [
            (101, _topic_encoder(["apple"])[0]),
            (102, _topic_encoder(["banana"])[0]),
            (103, _topic_encoder(["cherry"])[0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(corpus, k=2).localCheckpoint(eager=True)
    serving = quantize_embeddings(
        materialize_ivf_assignments(corpus, cents), keep_original=False
    )
    wh.append(serving, "ann_serving")

    seeded = bootstrap_semantic_index(
        wh, "ann_serving", id_col="vec_id", index_id_col="doc_id"
    )
    assert seeded == 3
    idx = wh.read("semantic_index")
    assert idx.count() == 3
    assert {r.batch_id for r in idx.collect()} == {BOOTSTRAP_BATCH_ID}
    assert sorted(r.doc_id for r in idx.collect()) == [101, 102, 103]

    # re-running the bootstrap overwrites, never duplicates
    assert bootstrap_semantic_index(
        wh, "ann_serving", id_col="vec_id", index_id_col="doc_id"
    ) == 3
    assert wh.read("semantic_index").count() == 3

    # first stream batch: doc 1 re-visits the apple topic -> dropped vs
    # the BOOTSTRAPPED index; doc 2 is a new topic and survives
    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "text": "apple pie with cinnamon and sugar",
             "lang": "en", "source": "a"},
            {"doc_id": 2, "text": "durian custard with sticky rice",
             "lang": "en", "source": "a"},
        ],
    )
    q = stream_corpus_increments(
        spark,
        str(inbox),
        wh,
        ckpt,
        centroids=cents,
        semantic_threshold=0.999,
        encoder=_topic_encoder,
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.drop_reason for r in wh.read("curated_docs").collect()}
    assert got == {1: "index_semantic_dup", 2: None}
    # only the keeper joined both indexes
    assert sorted(r.doc_id for r in wh.read("minhash_index").collect()) == [2]
    assert sorted(
        r.doc_id for r in wh.read("semantic_index").collect()
    ) == [2, 101, 102, 103]


def test_corpus_cli_semantic_flags_parse():
    from etl_sber_spark.corpus_cli import parse_args

    a = parse_args(
        [
            "--inbox", "x", "--warehouse", "y",
            "--centroids-table", "ann_ivf_centroids",
            "--semantic-threshold", "0.97",
            "--bootstrap-serving-table", "ann_serving",
        ]
    )
    assert a.centroids_table == "ann_ivf_centroids"
    assert a.semantic_threshold == 0.97
    assert a.bootstrap_serving_table == "ann_serving"
    b = parse_args(
        ["--inbox", "x", "--warehouse", "y",
         "--band-index-table", "minhash_bands"]
    )
    assert b.band_index_table == "minhash_bands"
    d = parse_args(["--inbox", "x", "--warehouse", "y"])
    assert d.centroids_table is None and d.bootstrap_serving_table is None
    assert d.band_index_table is None


def test_corpus_cli_semantic_bootstrap_subprocess(spark, tmp_path):
    """The composed CLI flow (r9): seed the semantic index from an ANN
    serving table via --bootstrap-serving-table, then one cron run
    whose first batch dedupes an exact re-crawl of a bootstrapped doc
    SEMANTICALLY (the documented bootstrap scope: the lexical index
    cannot be seeded from a vector table, but identical text embeds
    identically under the deterministic default encoder)."""
    import subprocess
    import sys

    from etl_sber_spark.operators.annindex import (
        materialize_ivf_assignments,
        save_ivf_index,
    )
    from etl_sber_spark.operators.inference import embed_texts
    from etl_sber_spark.operators.quantize import quantize_embeddings
    from etl_sber_spark.operators.similarity import kmeans_centroids

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh_dir = str(tmp_path / "wh")
    wh = Warehouse(spark, wh_dir)

    # the standing ANN corpus: two docs embedded by the DEFAULT stub
    # encoder (what the CLI's semantic stage will use), served as
    # centroid_id + SQ8
    corpus = spark.createDataFrame(
        [(101, BASE), (102, UNRELATED)], "vec_id long, text string"
    )
    emb = embed_texts(corpus, id_col="vec_id")
    cents = kmeans_centroids(emb, 2, 2).localCheckpoint(eager=True)
    save_ivf_index(wh, cents)
    wh.append(
        quantize_embeddings(materialize_ivf_assignments(emb, cents)),
        "ann_serving",
    )

    _write_jsonl(
        inbox / "b1.jsonl",
        [
            # exact copy of bootstrapped doc 101: invisible to the
            # (unseedable) lexical index, caught by the semantic stage
            {"doc_id": 1, "text": BASE, "lang": "en", "source": "a"},
            {"doc_id": 2, "text": BASE2, "lang": "en", "source": "a"},
        ],
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "etl_sber_spark.corpus_cli",
            "--inbox", str(inbox),
            "--warehouse", wh_dir,
            "--centroids-table", "ann_ivf_centroids",
            "--semantic-threshold", "0.999",
            "--bootstrap-serving-table", "ann_serving",
        ],
        capture_output=True,
        text=True,
        cwd=str(Path(__file__).resolve().parents[1]),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert (r["curated_total"], r["kept_total"], r["dropped_total"]) == (
        2, 1, 1,
    )
    # 2 bootstrapped + 1 streamed keeper
    assert r["semantic_index_size"] == 3
    assert r["index_size"] == 1  # minhash index: the keeper only

    got = {row.doc_id: row.drop_reason
           for row in wh.read("curated_docs").collect()}
    assert got == {1: "index_semantic_dup", 2: None}


def test_corpus_cli_encoder_flag():
    """--encoder parses; 'auto' without --centroids-table refuses (the
    flag would otherwise be silently ignored); 'auto' in THIS container
    (no embedding runtime) refuses rather than silently indexing stub
    vectors against a real-model quantizer."""
    import pytest

    from etl_sber_spark.corpus_cli import main, parse_args

    a = parse_args(["--inbox", "x", "--warehouse", "y",
                    "--encoder", "auto"])
    assert a.encoder == "auto"
    assert parse_args(["--inbox", "x", "--warehouse", "y"]).encoder == "stub"

    with pytest.raises(SystemExit, match="centroids-table"):
        main(["--inbox", "x", "--warehouse", "/tmp/nope_wh",
              "--encoder", "auto"])


def test_presized_buckets_identical_across_batches(spark, tmp_path):
    """presize_buckets (r9): the run-start committed-only bucket-size
    snapshot must leave every verdict and index row identical to the
    per-batch inline count, across batches that dedupe against the
    grown index."""
    def run(mode, sub):
        inbox = tmp_path / f"inbox_{sub}"
        inbox.mkdir()
        wh = Warehouse(spark, str(tmp_path / f"wh_{sub}"))
        ckpt = str(tmp_path / f"ck_{sub}")
        _write_jsonl(
            inbox / "b1.jsonl",
            [
                {"doc_id": 1, "text": BASE, "lang": "en", "source": "a"},
                {"doc_id": 2, "text": UNRELATED, "lang": "en",
                 "source": "a"},
            ],
        )
        q = stream_corpus_increments(
            spark, str(inbox), wh, ckpt, presize_buckets=mode
        )
        q.awaitTermination(120)
        _write_jsonl(
            inbox / "b2.jsonl",
            [
                {"doc_id": 11, "text": BASE.replace("lazy", "sleepy"),
                 "lang": "en", "source": "a"},
                {"doc_id": 12, "text": BASE2, "lang": "en", "source": "a"},
            ],
        )
        q = stream_corpus_increments(
            spark, str(inbox), wh, ckpt, presize_buckets=mode
        )
        q.awaitTermination(120)
        curated = sorted(
            (r.doc_id, r.drop_reason)
            for r in wh.read("curated_docs").collect()
        )
        index_ids = sorted(
            r.doc_id for r in wh.read("minhash_index").collect()
        )
        return curated, index_ids

    on = run(True, "on")
    off = run(False, "off")
    assert on == off
    assert on[0] == [(1, None), (2, None), (11, "index_near_dup"),
                     (12, None)]


def test_band_index_lockstep_and_identical_verdicts(spark, tmp_path):
    """band_index_table (r10): the batch_id-partitioned hashed band
    layout stays in lockstep with the signature index across batches,
    the index_near_dup verdict is produced THROUGH the band-table
    probe, and every verdict/index row is identical to a run without
    the layout."""
    from etl_sber_spark.operators.dedup import N_BANDS

    def run(band_table, sub):
        inbox = tmp_path / f"inbox_{sub}"
        inbox.mkdir()
        wh = Warehouse(spark, str(tmp_path / f"wh_{sub}"))
        ckpt = str(tmp_path / f"ck_{sub}")
        _write_jsonl(
            inbox / "b1.jsonl",
            [
                {"doc_id": 1, "text": BASE, "lang": "en", "source": "a"},
                {"doc_id": 2, "text": UNRELATED, "lang": "en",
                 "source": "a"},
            ],
        )
        q = stream_corpus_increments(
            spark, str(inbox), wh, ckpt, band_index_table=band_table
        )
        q.awaitTermination(120)
        _write_jsonl(
            inbox / "b2.jsonl",
            [
                {"doc_id": 11, "text": BASE.replace("lazy", "sleepy"),
                 "lang": "en", "source": "a"},
                {"doc_id": 12, "text": BASE2, "lang": "en", "source": "a"},
            ],
        )
        q = stream_corpus_increments(
            spark, str(inbox), wh, ckpt, band_index_table=band_table
        )
        q.awaitTermination(120)
        curated = sorted(
            (r.doc_id, r.drop_reason)
            for r in wh.read("curated_docs").collect()
        )
        index_ids = sorted(
            r.doc_id for r in wh.read("minhash_index").collect()
        )
        return wh, curated, index_ids

    wh_on, curated_on, idx_on = run("minhash_bands", "bands_on")
    wh_off, curated_off, idx_off = run(None, "bands_off")
    assert curated_on == curated_off
    assert idx_on == idx_off
    # doc 11 was dropped, so it must have no band rows (only keepers
    # enter the index and its band layout)
    assert 11 not in {
        r.doc_id for r in wh_on.read("minhash_bands").collect()
    }
    # lockstep, partition for partition: every sig row has its N_BANDS
    # band rows in the SAME batch_id partition
    sig = [
        (r.batch_id, r.doc_id)
        for r in wh_on.read("minhash_index").select(
            "batch_id", "doc_id"
        ).collect()
    ]
    band = sorted(
        ((r.batch_id, r.doc_id), r["count"])
        for r in wh_on.read("minhash_bands")
        .groupBy("batch_id", "doc_id")
        .count()
        .collect()
    )
    assert band == sorted(((k, N_BANDS) for k in sig))


def test_sync_band_index_backfills_standing_warehouse(spark, tmp_path):
    """Enabling band_index_table on a warehouse whose index predates it
    must backfill the committed batches at stream start (lockstep is a
    recall contract: a sig row with no band row silently drops its
    candidate pair — doc 11 would wrongly survive)."""
    from etl_sber_spark.streaming.corpus import sync_band_index

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        inbox / "b1.jsonl",
        [
            {"doc_id": 1, "text": BASE, "lang": "en", "source": "a"},
            {"doc_id": 2, "text": UNRELATED, "lang": "en", "source": "a"},
        ],
    )
    q = stream_corpus_increments(spark, str(inbox), wh, ckpt)  # no bands
    q.awaitTermination(120)
    assert not wh.has_data("minhash_bands")

    # enable the layout for the second run: sync backfills batch 0,
    # and the near-dup of batch-0's doc 1 is caught through it
    _write_jsonl(
        inbox / "b2.jsonl",
        [
            {"doc_id": 11, "text": BASE.replace("lazy", "sleepy"),
             "lang": "en", "source": "a"},
        ],
    )
    q = stream_corpus_increments(
        spark, str(inbox), wh, ckpt, band_index_table="minhash_bands"
    )
    q.awaitTermination(120)
    reasons = {r.doc_id: r.drop_reason for r in wh.read("curated_docs").collect()}
    assert reasons[11] == "index_near_dup"
    bands = wh.read("minhash_bands")
    assert sorted(
        r.batch_id for r in bands.select("batch_id").distinct().collect()
    ) == [0]  # batch 1's doc 11 was dropped -> no index rows, no band rows
    assert {r.doc_id for r in bands.collect()} == {1, 2}

    # re-sync is a no-op (everything already covered)
    assert sync_band_index(wh, "minhash_index", "minhash_bands") == 0


def test_sync_band_index_batch_built_bootstrap_and_stale_drop(spark, tmp_path):
    """A batch-built index (no batch_id column) bootstraps into the -1
    partition, idempotently; a band partition with no surviving sig
    partition is dropped on sync (stale rows would double-count docs
    into the thinning snapshot — the one unsound staleness
    direction)."""
    from pyspark.sql import functions as SF

    from etl_sber_spark.operators.dedup import N_BANDS, minhash_signatures
    from etl_sber_spark.operators.semindex import BOOTSTRAP_BATCH_ID
    from etl_sber_spark.streaming.corpus import sync_band_index

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [(1, BASE), (2, UNRELATED)], "doc_id long, text string"
    )
    wh.append(minhash_signatures(docs), "minhash_index")  # no batch_id

    assert sync_band_index(wh, "minhash_index", "minhash_bands") == 1
    bands = wh.read("minhash_bands")
    assert {r.batch_id for r in bands.collect()} == {BOOTSTRAP_BATCH_ID}
    assert bands.count() == 2 * N_BANDS
    # idempotent: overwrites the same partition, never duplicates
    assert sync_band_index(wh, "minhash_index", "minhash_bands") == 1
    assert wh.read("minhash_bands").count() == 2 * N_BANDS

    # the index is rebuilt batch-partitioned (doc 2 only, batch 7,
    # committed): sync must DROP the stale -1 partition and backfill 7
    wh.drop("minhash_index")
    wh.overwrite_partitions(
        minhash_signatures(docs.filter(SF.col("doc_id") == 2)).withColumn(
            "batch_id", SF.lit(7)
        ),
        "minhash_index",
        ["batch_id"],
    )
    wh.overwrite_partitions(
        spark.createDataFrame([(7,)], "batch_id bigint").withColumn(
            "applied", SF.lit(True)
        ),
        "curated_docs__applied_batches",
        ["batch_id"],
    )
    assert sync_band_index(wh, "minhash_index", "minhash_bands") == 2
    bands = wh.read("minhash_bands")
    assert {r.batch_id for r in bands.collect()} == {7}
    assert {r.doc_id for r in bands.collect()} == {2}
    assert bands.count() == N_BANDS


def test_band_index_crash_between_writes_replay(spark, tmp_path):
    """Crash after the sig write but before the band write and marker:
    sync at the next start must NOT backfill the uncommitted batch
    (the checkpoint redelivers it under its own batch_id), and the
    replay's partition overwrite restores lockstep with no
    duplicates."""
    from etl_sber_spark.operators.dedup import N_BANDS

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    _write_jsonl(
        inbox / "b1.jsonl",
        [{"doc_id": 1, "text": BASE, "lang": "en", "source": "a"}],
    )
    q = stream_corpus_increments(
        spark, str(inbox), wh, str(tmp_path / "ck1"),
        band_index_table="minhash_bands",
    )
    q.awaitTermination(120)
    assert wh.read("minhash_bands").count() == N_BANDS

    # simulate the crash state: band partition and marker gone, sig
    # partition (now uncommitted debris) still there
    assert wh.drop_partition("minhash_bands", "batch_id", 0)
    wh.drop("curated_docs__applied_batches")

    # fresh checkpoint redelivers the file as batch 0
    q = stream_corpus_increments(
        spark, str(inbox), wh, str(tmp_path / "ck2"),
        band_index_table="minhash_bands",
    )
    q.awaitTermination(120)
    assert wh.read("curated_docs").count() == 1
    assert wh.read("curated_docs").collect()[0].drop_reason is None
    assert wh.read("minhash_index").count() == 1
    assert wh.read("minhash_bands").count() == N_BANDS
