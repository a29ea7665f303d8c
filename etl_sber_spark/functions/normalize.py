"""Ingest-time normalization expressions.

These reproduce the data quirks the reference relies on (SURVEY.md §1.4)
as pure Catalyst projections — no UDFs, so they stay inside whole-stage
codegen and cost a single pass over the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Open-interval sentinel used by the reference's SCD2 dimension
#: (main.py:50 ``to_timestamp('2999-12-31 23:59:59', ...)``).
MAX_TS = "2999-12-31 23:59:59"


def max_ts_lit() -> Column:
    return F.lit(MAX_TS).cast(T.TimestampType())


def portable_round(col: Column, ndigits: int) -> Column:
    """Cross-engine deterministic rounding: ``floor(x·10ⁿ + 0.5)/10ⁿ``.

    Engine ``round()`` builtins DIVERGE near scaled ties: Spark rounds
    the shortest-decimal rendering HALF_UP (BigDecimal.valueOf) while
    DuckDB ``std::round``s the scaled double — a graded quality score of
    0.82325 rendered 0.8233 vs 0.8232 (the round-4 sf0.1 sweep flake).
    Every step here is a single IEEE operation with one result in both
    engines, so differentially-graded outputs MUST use this form for any
    value that can be a small-denominator rational (ratios, ranks,
    weighted sums of decimal-ish inputs). The DuckDB-side rendering is
    the literal ``floor(x * 10^n + 0.5) / 10^n``. Negative inputs round
    half-up toward +∞ (not away from zero) — fine for the similarity /
    score ranges this engine grades; state the contract if reusing on
    signed data.
    """
    scale = float(10**ndigits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def comma_decimal(col: Column | str, precision: int = 20, scale: int = 2) -> Column:
    """Repair a comma-decimal string (``'1046,40'``) into a decimal.

    The reference ships amounts with a comma separator
    (transactions_01032021.txt) and relies on Oracle's implicit NLS
    string->number cast (main.py:324). Here it is an explicit
    ``regexp_replace`` + cast — deterministic and pushed into codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), ",", ".").cast(T.DecimalType(precision, scale))


def trim_all_strings(df: DataFrame) -> DataFrame:
    """Trim every string column.

    The reference's day-2 file carries whitespace-padded values that reach
    the warehouse un-trimmed except where SQL wraps ``trim()`` ad hoc
    (main.py:370, 399, 416). Canonical behavior (SURVEY.md §7.4): trim all
    string columns once at ingest.
    """
    return df.select(
        *[
            F.trim(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def full_name(last: str, first: str, patronymic: str) -> Column:
    """``last || ' ' || first || ' ' || patronymic`` (main.py:396).

    Oracle ``||`` treats NULL as '' — ``concat_ws`` matches that; Spark's
    plain ``concat`` would null the whole result (SURVEY.md §2.3 P2).
    """
    return F.concat_ws(" ", F.col(last), F.col(first), F.col(patronymic))
