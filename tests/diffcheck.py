"""Local replica of the driver's DuckDB differential check.

Runs a Spark DataFrame and the matching DuckDB oracle SQL, canonicalizes
both result sets (column order by name, value *string rendering*,
order-insensitive row sort) and compares row count + column names + the
full sorted payload. Stricter than a hash: on mismatch it shows the first
differing rows for debugging.

Canonicalization deliberately mirrors the driver, which round-1 proved is
pandas-mediated and rendering-based:

- the DuckDB side is fetched via ``rel.df()`` — DECIMAL and HUGEINT both
  become float64 there;
- the Spark side keeps ``decimal.Decimal`` objects (collect/toPandas
  agree on that);
- values are compared by their string rendering with NO numeric-type
  leniency: ``Decimal('1.4600')`` renders ``'1.4600'`` and does NOT match
  float ``1.46`` — exactly the trailing-zero mismatch that turned six
  round-1 queries red. Queries must emit output types whose renderings
  agree (rule: final aggregates as DOUBLE on both sides).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

# pandas.Timestamp ns-range bounds, hardcoded so _norm needs no pandas import
_PD_TS_MIN = dt.datetime(1677, 9, 21, 0, 12, 43, 145224)
_PD_TS_MAX = dt.datetime(2262, 4, 11, 23, 47, 16, 854775)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Render one value the way the driver's hash sees it (no type tags)."""
    import numpy as np

    if v is None:
        return "\x00NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, decimal.Decimal):
        # NOT normalized: trailing zeros stay, mismatching float renderings
        return str(v)
    if isinstance(v, dt.datetime):
        v = v.replace(tzinfo=None)
        # The driver converts BOTH engines' results through pandas, whose
        # ns-resolution Timestamp covers only ~1677..2262. A value outside
        # that range (e.g. an SCD2 open-version sentinel 2999-12-31) may
        # happen to survive this local harness yet die in the driver with
        # OutOfBoundsDatetime (round-2 q_scd2_snapshot). Refuse it here so
        # local green predicts driver green: queries must format such
        # timestamps as strings in their output projection.
        if not (_PD_TS_MIN <= v <= _PD_TS_MAX):
            raise AssertionError(
                f"timestamp {v} is outside the pandas ns range "
                f"[{_PD_TS_MIN}, {_PD_TS_MAX}]; the driver's rendering "
                "would raise OutOfBoundsDatetime — emit this column as a "
                "formatted string instead"
            )
        # DATE columns surface as midnight datetime64 on the pandas path;
        # render exact-midnight datetimes as bare dates so both engines'
        # DATE renderings agree (symmetric, so no false passes).
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return str(v)
    if isinstance(v, dt.date):
        return str(v)
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "__len__") and hasattr(v, "tolist") and not isinstance(v, str)
    ):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_norm(x) for x in seq) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str):
    import pandas as pd  # noqa: F401  (pandas path is the point)

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    pdf = con.execute(sql).df()  # pandas path: decimals/hugeints -> float64
    d_cols = list(pdf.columns)
    d_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    cs = canonical_rows(s_cols, s_rows)
    cd = canonical_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
