"""Int8 scalar quantization of embedding columns.

A 100 TB embedding store is IO-bound: a 1024-dim float32 vector is
4 KiB/row, and every ANN candidate scan pays it. Symmetric per-vector
int8 quantization cuts that 4x (1 byte/dim + one float scale) with a
bounded, well-understood recall cost — the standard first compression
step in production vector stores (FAISS ``SQ8``, Lucene/Elasticsearch
``int8_hnsw``) before going to product quantization.

Scheme (symmetric, per-vector):

    scale  = max(|x_i|) / 127
    q_i    = round_half_up(x_i / scale)        in [-127, 127]
    x_i    ~ q_i * scale                       (|error| <= scale/2)

All pure Catalyst array expressions — quantization is a projection over
the scan (zero shuffles), and the quantized dot product folds in BIGINT
(exact integer arithmetic, order-independent) with one float multiply
at the end: ``dot(a, b) ~ dot_int(qa, qb) * scale_a * scale_b``. The
rounding is ``floor(x + 0.5)`` (half-up), NOT banker's rounding, so
DuckDB can replay the arithmetic bit-for-bit in the differential test
(tests/test_quantize.py) — the same portability rule as hash64.

Zero vectors quantize to scale 0 with all-zero components (a guarded
division: ``scale = 0`` would otherwise NaN every component); their
quantized cosine against anything is NULL, matching exact cosine's
0/0 behavior.

Reference parity: the reference (bank ETL, main.py) has no vector
surface; this extends the similarity-search stack (SURVEY.md §7.5,
operators/similarity.py) with the storage-efficiency path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: int8 symmetric range: q in [-QMAX, QMAX]
QMAX = 127


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _round_half_up(x: Column) -> Column:
    """floor(x + 0.5): portable across Spark and DuckDB (both engines'
    native round() disagree on ties for negative values / use banker's
    rounding in some paths)."""
    return F.floor(x + F.lit(0.5)).cast("long")


def quantize_cols(vec: Column | str) -> tuple[Column, Column]:
    """(scale, qvec) expressions for one embedding column.

    ``scale`` is double; ``qvec`` is ``array<smallint>`` with components
    in [-127, 127] (smallint because Spark has no unsigned byte and the
    +-127 range fits; parquet stores it as a dictionary-packed int —
    still 4x smaller than float32 after encoding, and the type documents
    the true width).
    """
    v = _c(vec).cast("array<double>")
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(float(QMAX))
    )
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("smallint"))).otherwise(
        F.transform(v, lambda x: _round_half_up(x / scale).cast("smallint"))
    )
    return scale, q


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_col: str = "q_scale",
    qvec_col: str = "qvec",
    keep_original: bool = False,
    norm_col: str | None = None,
) -> DataFrame:
    """Add ``scale_col`` + ``qvec_col``; drop the float vector unless
    ``keep_original`` (the point is to NOT carry 4 bytes/dim around).

    ``norm_col`` additionally stores the exact BIGINT self-dot
    ``dot_int(q, q)`` (r7): cosine needs |q| per candidate, and
    computing it at query time is a second interpreted array fold over
    every scanned row — one bigint column at ingest removes it
    (measured: stored-SQ8 IVF search 4.4 → ~0.5 s at 100k vectors,
    tools/scale_smoke_ann.py). Scales cancel in cosine, so a search
    that uses ``norm_col`` reads ONLY (id, centroid_id, qvec, norm)."""
    scale, q = quantize_cols(vec_col)
    out = df.withColumn(scale_col, scale).withColumn(qvec_col, q)
    if norm_col is not None:
        out = out.withColumn(norm_col, dot_int_expr(qvec_col, qvec_col))
    return out if keep_original else out.drop(vec_col)


def dequantize_expr(qvec: Column | str, scale: Column | str) -> Column:
    """array<double> reconstruction: q_i * scale (error <= scale/2/dim)."""
    s = _c(scale)
    return F.transform(_c(qvec), lambda q: q.cast("double") * s)


def dot_int_expr(qa: Column | str, qb: Column | str) -> Column:
    """Exact BIGINT dot product of two quantized vectors (<= 127^2 * dims
    per term — overflow-safe to ~5e14 dims)."""
    return F.aggregate(
        F.zip_with(_c(qa), _c(qb), lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_q_expr(
    qa: Column | str,
    sa: Column | str | None,
    qb: Column | str,
    sb: Column | str | None,
    *,
    qa_norm: Column | str | None = None,
    qb_norm: Column | str | None = None,
) -> Column:
    """Approximate cosine from quantized vectors.

    The scales cancel in cosine, so this is the all-integer
    ``dot/(|qa|*|qb|)`` — no float accumulation at all; NULL when either
    vector is all-zero (0/0), matching exact cosine. ``sa``/``sb`` are
    accepted for call-site symmetry with the (qvec, scale) pairs the
    quantizer emits and are unused (the cancellation IS the point).
    ``qa_norm``/``qb_norm`` (r8) name stored ``dot(q, q)`` columns
    (``quantize_embeddings(norm_col=…)``), replacing the per-row
    self-dots with one stored read — the single definition of the
    guarded quotient every stored-SQ8 scorer shares."""
    num = dot_int_expr(qa, qb).cast("double")
    na_dot = _c(qa_norm) if qa_norm is not None else dot_int_expr(qa, qa)
    nb_dot = _c(qb_norm) if qb_norm is not None else dot_int_expr(qb, qb)
    na = F.sqrt(na_dot.cast("double"))
    nb = F.sqrt(nb_dot.cast("double"))
    return F.when((na > 0.0) & (nb > 0.0), num / (na * nb))


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k over QUANTIZED vectors: the int8 twin of
    similarity.cosine_topk_bruteforce, for measuring the recall cost of
    quantization (tests/test_quantize.py pins recall@10 >= 0.9).

    Same shape as the exact operator: broadcast queries, per-row integer
    fold, two-phase top-k. The corpus side reads 1/4 the bytes — at
    100 TB that is the difference that matters.
    """
    from pyspark.sql import Window

    qc = quantize_embeddings(corpus, vec_col)
    qq = quantize_embeddings(
        queries.select(F.col(id_col).alias(query_id_col), vec_col), vec_col,
        scale_col="q_scale_q", qvec_col="qvec_q",
    )
    scored = qc.join(F.broadcast(qq)).select(
        query_id_col,
        id_col,
        cosine_q_expr("qvec", "q_scale", "qvec_q", "q_scale_q").alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull() & (F.col(query_id_col) != F.col(id_col)))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
