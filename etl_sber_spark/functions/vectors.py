"""Vector math over array<float|double> columns — JVM-side, no UDFs.

``F.zip_with`` + ``F.aggregate`` fold left-to-right in array order, which
makes the floating-point sum deterministic (same order every run and the
same order DuckDB's list functions use) — required for differential tests.
At scale these are per-row expressions: they parallelize with the scan and
never shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """NULL on a zero-norm side (``try_divide``), never an error.

    Zero vectors are a routine artifact of failed embedding calls; a
    plain ``/`` raises DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    and would abort a corpus-wide top-k/dedup job on one bad row. NULL
    similarity ranks after every real similarity (DESC puts NULLs
    last), which is the wanted degradation — and matches DuckDB's
    divide-by-zero → NULL, so differential oracles agree.
    """
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))
