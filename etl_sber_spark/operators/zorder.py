"""Z-order (Morton) clustering for MULTI-column data skipping.

``Warehouse.append(cluster_by=[a, b])`` sorts lexicographically: zone
maps get tight on ``a`` but column ``b``'s per-file ranges stay as wide
as the whole domain — a filter on ``b`` alone prunes nothing. Z-order
interleaves the BITS of both columns' ranks into one sort key, so files
cover small HYPER-RECTANGLES of the (a, b) space and parquet footer
min/max stats become selective for predicates on EITHER column (or
both) — the same layout Delta's ``OPTIMIZE ZORDER BY`` and
ClickHouse/DuckDB space-filling-curve orderings produce, expressed here
with open-source Spark primitives.

Mechanics:

- per column, a bounded integer rank: min/max collected ONCE (one
  metadata-scale aggregate job — the k-means-centroid pattern), then
  ``floor((x − min)/(max − min) · (2^bits − 1) + 0.5)`` as a pure
  projection. Timestamps/dates rank on their epoch numbers; strings
  rank on ``hash64`` → uniform but ORDER-FREE (good for point probes —
  equality predicates still prune; range predicates on strings need a
  real collation rank, stated limitation).
- the z-key: bit-interleave of the per-column ranks — a fixed chain of
  shift/or terms, whole-stage-codegen'd, no UDF.
- layout: ``repartitionByRange(_zkey)`` + ``sortWithinPartitions`` —
  the same ONE range shuffle ``cluster_by`` pays.

Skew note: min-max ranking is distribution-agnostic; a heavily skewed
column wastes rank resolution around its hot region. ``bits=16`` per
column fits 2-3 columns in the 63-bit key (four columns need
``bits=15`` or fewer), and the range shuffle equalizes ROWS per file
regardless, so skew costs selectivity only, not balance.

Reference parity: the reference's Oracle tables rely on B-tree indexes
(main.py DDL); Spark's parquet lakehouse answer to "fast selective
reads on more than one column" is exactly this clustering, hence the
extension. Verified on real parquet footers in tests/test_zorder.py:
multi-dimensional probes touch a small fraction of files on the
z-ordered layout vs ~all files on the lexicographic one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import hash64

#: default rank resolution per column
DEFAULT_BITS = 16


def _numeric_expr(col: Column, dtype: T.DataType) -> Column:
    """The orderable double of one supported z-column; raises a clear
    error for types with no meaningful linear rank (binary, arrays —
    review finding: TimestampNTZ used to fall into the numeric branch
    and crash on ``float(datetime)`` deep in the stats fold)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # NTZ → timestamp is identity under the fixed session tz the
        # repo runs with (sources/tables.py normalizes scans the same way)
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast(
            "double"
        )
    if isinstance(dtype, T.NumericType):
        return col.cast("double")
    raise ValueError(
        f"zorder_key: unsupported column type {dtype.simpleString()} — "
        "numeric, date, timestamp(_ntz), or string columns only"
    )


def _finite(x: Column) -> Column:
    return (
        ~F.isnan(x)
        & (x > F.lit(float("-inf")))
        & (x < F.lit(float("inf")))
    )


def _rank_expr(
    col: Column, dtype: T.DataType, lo, hi, bits: int
) -> Column:
    """Bounded integer rank of one column — a pure projection against
    driver-side (lo, hi) literals. NULLs and non-finite values rank 0
    (they cluster together at the low corner, which is what IS NULL
    probes want; a NaN/inf must not poison the arithmetic — see
    zorder_key's finite-only stats, review finding)."""
    top = (1 << bits) - 1
    if isinstance(dtype, T.StringType):
        # order-free uniform rank: equality probes prune, range
        # predicates on strings do not (documented)
        r = F.pmod(hash64(col), F.lit(top + 1))
    else:
        x = _numeric_expr(col, dtype)
        a, b = float(lo), float(hi)
        span = (b - a) or 1.0
        r = F.when(
            _finite(x),
            F.floor(
                (x - F.lit(a)) / F.lit(span) * F.lit(float(top))
                + F.lit(0.5)
            ),
        )
    return F.coalesce(r.cast("long"), F.lit(0))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS
) -> Column:
    """The Morton interleave of ``cols``'s ranks as one LONG column.

    Executes ONE aggregate job up front (per-column min/max — the
    metadata-scale stats the rank projection needs as literals), then
    the key itself is a pure projection. ``len(cols) · bits`` must fit
    63 bits.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1:
        raise ValueError(
            f"bits must be >= 1, got {bits} — bits=0 would make every "
            "key 0 and the layout silently unclustered"
        )
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} key "
            "bits > 63 — lower bits= (selectivity degrades gracefully)"
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    numeric = [
        c for c in cols if not isinstance(dtypes[c], T.StringType)
    ]
    stats: dict[str, tuple] = {}
    if numeric:
        aggs = []
        for c in numeric:
            # finite values only: one NaN/inf row would otherwise make
            # the span NaN and silently zero the whole dimension's
            # ranks (review finding)
            x = _numeric_expr(F.col(c), dtypes[c])
            x = F.when(_finite(x), x)
            aggs += [F.min(x).alias(f"_lo_{c}"), F.max(x).alias(f"_hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        for c in numeric:
            lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
            stats[c] = (0, 1) if lo is None else (lo, hi)
    ranks = [
        _rank_expr(F.col(c), dtypes[c], *stats.get(c, (0, 1)), bits)
        for c in cols
    ]
    # interleave: output bit (j*len(cols) + i) = rank_i's bit j — the
    # classic Morton layout, low bits varying fastest across columns
    n = len(cols)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return key


def append_zordered(
    wh,
    df: DataFrame,
    name: str,
    cols: list[str],
    *,
    bits: int = DEFAULT_BITS,
    partition_by: list[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Append ``df`` laid out along the Z-curve of ``cols``: one stats
    aggregate + one range shuffle; the key column never persists.

    ``n_files`` forces the range-shuffle partition count (= output file
    count). Default None lets AQE size partitions by bytes — right at
    warehouse scale, but a SMALL append may coalesce to so few files
    that per-file footer ranges cover most of the curve and nothing
    prunes; file-skipping selectivity scales with the file count
    (each file covers ~1/n of the curve → ~n^(-1/len(cols)) of each
    dimension's domain)."""
    if "_zkey" in df.columns:
        raise ValueError(
            "df already has a column named _zkey — the operator's "
            "internal sort key would silently overwrite and then drop "
            "it; rename the data column first"
        )
    keyed = df.withColumn("_zkey", zorder_key(df, cols, bits))
    parts = [n_files] if n_files else []
    keyed = keyed.repartitionByRange(*parts, "_zkey").sortWithinPartitions(
        "_zkey"
    )
    wh.append(keyed.drop("_zkey"), name, partition_by=partition_by)
