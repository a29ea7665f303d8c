"""Data-quality checks as declarative DataFrame ops.

The reference has no validation at all (print-and-continue error
handling, SURVEY.md §2.8) — a real warehouse runs these between load
and publish. Each check returns violation ROWS (not booleans), so the
same op serves gating (count == 0), quarantining (sink the rows), and
reporting. All pure relational ops: counts/aggregates/anti-joins — one
pass each, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with NULL in any of the declared NOT-NULL columns."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key groups appearing more than once: (key..., n_rows)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose NON-NULL foreign key has no parent — a
    left_anti join, shuffle on the key only. NULL child keys are
    excluded (SQL's FK semantics: a NULL reference satisfies the
    constraint); a pipeline that forbids NULL keys declares that via
    :func:`null_violations`, and before this filter the same row was
    double-reported by both checks (r9 review)."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def range_violations(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.filter(cond)


def dq_summary(df: DataFrame, checks: dict[str, DataFrame]) -> DataFrame:
    """One-row summary: total rows + violation count per named check.
    Aggregates each check once; intended for the end-of-load gate."""
    spark = df.sparkSession
    rows = [("total_rows", df.count())] + [
        (name, v.count()) for name, v in checks.items()
    ]
    return spark.createDataFrame(rows, ["check", "n"])
