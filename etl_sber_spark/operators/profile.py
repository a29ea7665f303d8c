"""One-pass table profiling: per-column statistics at corpus scale.

The data-engineer's first query against any new table — row counts,
null rates, cardinalities, ranges — as ONE aggregate over the table
(every per-column statistic rides the same map-side partial
aggregation), reshaped driver-lessly into one row per column. The
reference profiles nothing (fixed DDL, trusted sources); this is the
operational complement to the rule-based checks in operators/quality.py
and the corpus-level datacard (operators/datacard.py).

Design points for 100 TB:

- **One job, one reduce row.** All statistics aggregate into a single
  row (no shuffle fan-out — the reduce side is one task with one row),
  then a literal explode turns it into the (column, stats) table:
  metadata-scale output, never a second scan.
- **Distinct counts are HLL sketches** (``approx_count_distinct``,
  default 2% rsd) — the only one-pass-mergeable option; an EXACT
  per-column distinct would Expand the corpus ``n_cols``× (one
  duplicate of every row per distinct aggregate), which is the
  classic accidental-10×-shuffle. ``exact=True`` opts in knowingly.
- **Min/max/sample rendered as strings** so one fixed output schema
  covers heterogeneous column types (the driver-side contract of every
  profiler UI); numeric mean additionally computed where the type
  allows — exact DECIMAL accumulation for integer/decimal columns, but
  plain double ``avg`` for float/double ones: a profiler runs against
  UNKNOWN data, and a decimal accumulator dies (ANSI) or silently
  skips (non-ANSI) on legitimate doubles like 1e30.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Profile ``columns`` (default: all) into one row per column.

    Output schema (fixed): ``column``, ``dtype``, ``n_rows``,
    ``n_null``, ``null_frac`` (6-dp double), ``n_distinct`` (approx
    unless ``exact_distinct``), ``min_repr``, ``max_repr`` (string
    renderings), ``mean`` (double; NULL for non-numeric columns).

    Complex-typed columns (array/map/struct/binary) profile counts and
    nulls only — min/max/mean are NULL (no portable ordering).
    """
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    unknown = [c for c in cols if c not in schema]
    if unknown:
        raise ValueError(f"profile: unknown columns {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = schema[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__nn"))
        simple = not isinstance(
            dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"{c}__nd"))
        else:
            aggs.append(
                F.approx_count_distinct(col, rsd).alias(f"{c}__nd")
            )
        if simple:
            aggs.append(F.min(col).cast("string").alias(f"{c}__mn"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__mx"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mn"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__mx"))
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # floats: plain double avg. A decimal accumulator here would
            # CRASH the whole profile under ANSI on any value outside
            # its precision (1e30 is a legitimate double) and silently
            # null such rows out of the mean under ANSI-off — profiling
            # must never assume the data it is inspecting is tame
            # (round-4 review finding).
            aggs.append(F.avg(col).alias(f"{c}__mean"))
        elif isinstance(dt, T.DecimalType):
            # decimals: sum as DOUBLE, not in the widened decimal type —
            # for a high-precision column (DECIMAL(38,x)) the widened
            # sum SATURATES at precision 38, so enough large rows
            # overflow it: crash under ANSI, silent NULL under ANSI-off.
            # Same unknown-data hazard class as the float finding above;
            # a profiler's mean is a summary statistic, double suffices
            # (ADVICE round 4).
            aggs.append(F.avg(col.cast("double")).alias(f"{c}__mean"))
        elif isinstance(dt, _NUMERIC):
            # integers: DECIMAL(38,0) accumulation is exact and cannot
            # overflow (9e18 max-longs x 1e19 rows fits 38 digits)
            aggs.append(
                (
                    F.sum(col.cast(T.DecimalType(38, 0))).cast("double")
                    / F.count(col).cast("double")
                ).alias(f"{c}__mean")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))

    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(schema[c].simpleString()).alias("dtype"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
                F.round(
                    (F.col("__n") - F.col(f"{c}__nn")).cast("double")
                    / F.greatest(F.col("__n"), F.lit(1)).cast("double"),
                    6,
                ).alias("null_frac"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_repr"),
                F.col(f"{c}__mx").alias("max_repr"),
                F.col(f"{c}__mean").alias("mean"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def top_values(
    df: DataFrame, column: str, k: int = 10
) -> DataFrame:
    """The ``k`` most frequent values of ``column`` with counts —
    two-phase (local top-k per partition via WindowGroupLimit before the
    tiny global rank), so a heavy-hitter probe never globally sorts the
    full value histogram. Ties break on the value rendering for
    determinism. NULLs count as a value (rendered NULL)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(column).cast("string").alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("value"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
