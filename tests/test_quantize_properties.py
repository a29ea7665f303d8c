"""Property-based tests for int8 quantization (operators/quantize.py):
the error bound, range bound, and zero-vector contract must hold for
ARBITRARY finite float vectors, not just the fixture embeddings —
hypothesis hunts the edges (tiny magnitudes, mixed signs, constant
vectors, near-tie rounding)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_sber_spark.operators.quantize import (
    QMAX,
    dequantize_expr,
    quantize_embeddings,
)

finite_floats = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    width=32,  # embeddings are float32
)

vectors = st.lists(
    st.lists(finite_floats, min_size=1, max_size=16),
    min_size=1,
    max_size=8,
)


@given(vecs=vectors)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_quantization_invariants(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    q = quantize_embeddings(df, keep_original=True)
    rows = q.select(
        "vec_id",
        "q_scale",
        "qvec",
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize_expr("qvec", "q_scale"),
                lambda x, r: F.abs(x - r),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
    ).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        vec = vecs[r.vec_id]
        if all(x == 0.0 for x in vec):
            # zero vector: scale 0, all-zero components (no NaN leak)
            assert r.q_scale == 0.0
            assert all(c == 0 for c in r.qvec)
            continue
        assert r.q_scale > 0.0
        assert all(-QMAX <= c <= QMAX for c in r.qvec), r.qvec
        # reconstruction error bound: half a quantization step
        assert r.max_err <= r.q_scale / 2 + 1e-9, (r.max_err, r.q_scale)
        # the max-magnitude component must hit full scale (+-QMAX)
        assert max(abs(c) for c in r.qvec) == QMAX
