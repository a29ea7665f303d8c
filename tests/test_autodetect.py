"""Real-codec / real-encoder autodetect (VERDICT r5 #6).

The r5 injection points (decode_features' ``decoder=``, embed_texts'
``encoder=``) gained driver-side autodetect builders: auto_decoder()
(PIL / PyAV) and auto_encoder() (sentence-transformers). These tests
run the REAL libraries when they exist and skip cleanly when they
don't — the stub-driven conformer contract tests
(tests/test_multimodal.py, tests/test_inference.py) remain the spec
either way; this file only proves the auto-built callables satisfy it.
"""

from __future__ import annotations

import pytest


def _importable(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


# ---------------------------------------------------------------------------
# Codec-free container: autodetect must decline, not crash
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    _importable("PIL.Image") or _importable("av"),
    reason="a media library exists — the real-codec tests below apply",
)
def test_auto_decoder_declines_without_codecs():
    from etl_sber_spark.operators import multimodal as mm

    assert mm.auto_decoder() is None


@pytest.mark.skipif(
    _importable("sentence_transformers"),
    reason="an embedding runtime exists — the real-encoder test applies",
)
def test_auto_encoder_declines_without_runtime():
    from etl_sber_spark.operators import inference as inf

    assert inf.auto_encoder() is None


# ---------------------------------------------------------------------------
# Library-present integration (skips in this container)
# ---------------------------------------------------------------------------


def test_auto_decoder_real_png(spark):
    """When PIL exists: a real PNG through the full Arrow decode path
    yields its true dimensions — the production swap-in is drop-in."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from etl_sber_spark.operators import multimodal as mm

    dec = mm.auto_decoder()
    assert dec is not None

    buf = io.BytesIO()
    PIL_Image.new("RGB", (320, 200)).save(buf, format="PNG")
    png = buf.getvalue()

    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", None)],
        "media_id bigint, media_type string, payload binary",
    )
    rows = {r.media_id: r for r in mm.decode_features(df, decoder=dec).collect()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (320, 200, 1)
    # NULL payload law holds for the real codec path too
    assert rows[2].width is None and rows[2].payload_hash is None


def test_auto_decoder_unsupported_type_is_loud():
    """A media_type with no available codec must raise inside the
    decoder (loud per-row failure), never fake dimensions."""
    if not (_importable("PIL.Image") or _importable("av")):
        pytest.skip("no media library in this container")
    from etl_sber_spark.operators import multimodal as mm

    dec = mm.auto_decoder()
    missing = "video" if not _importable("av") else "audio"
    with pytest.raises(ValueError, match="no codec"):
        dec(b"payload", missing)


def test_auto_encoder_real_model(spark):
    """When sentence-transformers exists: real embeddings through
    embed_texts keep the one-vector-per-text / fixed-width / NULL-law
    contract."""
    pytest.importorskip("sentence_transformers")
    from etl_sber_spark.operators import inference as inf

    enc = inf.auto_encoder()
    assert enc is not None
    df = spark.createDataFrame(
        [(1, "a short document"), (2, None), (3, "another document")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in inf.embed_texts(df, encoder=enc).collect()}
    assert rows[2].embedding is None
    dims = {len(rows[i].embedding) for i in (1, 3)}
    assert len(dims) == 1 and dims.pop() > 0
