"""Slowly-changing-dimension maintenance (SURVEY.md §2.6 S1-S4).

The reference maintains its terminal dimension as SCD2 via staged CTAS
diffs + UPDATE close-outs + three INSERTs (main.py:72-188), and its
blacklist as an append-only "SCD1" (main.py:240-296). Parquet has no
UPDATE, so ``scd2_apply`` is a read-modify-rewrite: one pass that
classifies every history row and every staged row, producing the complete
next history (the sink swaps it in atomically — sinks/warehouse.py).

Scale design: the diff is three hash-joins on the dimension key; the
rewrite is a projection + union — no window over the whole history, no
driver round-trips. Dimensions are small by definition (broadcast-able),
but nothing here breaks if they aren't: every join is an equi-join on the
key, so it degrades to a partitioned shuffle join.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import max_ts_lit


def _neq_any(left: str, right: str, attrs: list[str]) -> Column:
    """Null-unsafe attribute-change disjunction (main.py:120-122).

    Deliberately ``!=`` not ``<=>``: NULL attribute transitions are NOT
    detected as changes, faithfully reproducing the reference's 3-valued
    logic (SURVEY.md §2.4 F5).
    """
    cond = F.lit(False)
    for a in attrs:
        cond = cond | (F.col(f"{left}.{a}") != F.col(f"{right}.{a}"))
    return cond


@dataclass
class SnapshotDiff:
    new: DataFrame
    changed: DataFrame
    deleted: DataFrame


def snapshot_diff(
    stg: DataFrame, current: DataFrame, key: str, attrs: list[str]
) -> SnapshotDiff:
    """Full CDC diff of a snapshot vs the current dimension state (S1).

    - new     = stg rows whose key is absent from current (anti, J1 —
      main.py:74-85);
    - deleted = current rows whose key is absent from stg (anti, J2 —
      main.py:92-103);
    - changed = stg rows whose key exists with any differing attribute
      (inner + neq residual, J4 — main.py:110-124).

    Both inputs are read up to three times; callers that materialize
    them once (``.cache()``) avoid re-scanning — pipeline.py does.
    """
    cols = [key, *attrs]
    stg = stg.select(*cols).alias("stg")
    cur = current.select(*cols).alias("cur")
    new = stg.join(cur, on=key, how="left_anti")
    deleted = cur.join(stg, on=key, how="left_anti")
    changed = (
        stg.join(
            cur,
            (F.col(f"stg.{key}") == F.col(f"cur.{key}"))
            & _neq_any("stg", "cur", attrs),
            "inner",
        )
        .select([F.col(f"stg.{c}").alias(c) for c in cols])
    )
    return SnapshotDiff(new=new, changed=changed, deleted=deleted)


def scd2_current(
    hist: DataFrame, processing_ts: dt.datetime | Column
) -> DataFrame:
    """The as-of view (main.py:56-67): open at ``processing_ts`` and not
    deleted. ``sysdate`` is parameterized per SURVEY.md §3.4."""
    ts = (
        F.lit(processing_ts).cast("timestamp")
        if isinstance(processing_ts, dt.datetime)
        else processing_ts
    )
    return hist.filter(
        ts.between(F.col("effective_from"), F.col("effective_to"))
        & (F.col("deleted_flg") == 0)
    )


def scd2_apply(
    hist: DataFrame,
    stg: DataFrame,
    key: str,
    attrs: list[str],
    processing_ts: dt.datetime,
) -> DataFrame:
    """Apply one snapshot to an SCD2 history; returns the NEXT history.

    Reproduces main.py:129-188 without UPDATE:

    1. close-out: open versions (effective_to = the 2999 sentinel) whose
       key is in (changed ∪ deleted) get effective_to = processing_ts - 1s
       (the reference's ``sysdate - 1/24/60/60``, main.py:131-142);
    2. append new rows and new versions of changed rows with defaults
       (deleted_flg=0, effective_from=processing_ts, effective_to=max —
       main.py:143-170 + DDL defaults main.py:48-50);
    3. append open tombstones for deleted keys (deleted_flg=1,
       main.py:171-186).

    The result is a full replacement of the history table — the caller
    writes it via an atomic swap (the table can't be overwritten while
    being read, SURVEY.md §4.3.1).

    Canonical deviation (found by the property suite, documented per
    SURVEY.md §7.4): when a previously-deleted key REAPPEARS in a
    snapshot, its open tombstone is closed alongside the new version.
    The reference would leave the tombstone's effective_to at the 2999
    sentinel forever (its close-out UPDATEs only target changed/deleted
    keys, main.py:131-142) — harmless for its data (no re-adds ever
    occur) but it breaks the one-open-version-per-key invariant.
    """
    cols = [key, *attrs]
    ts = F.lit(processing_ts).cast("timestamp")
    closed_ts = F.lit(processing_ts - dt.timedelta(seconds=1)).cast("timestamp")

    current = scd2_current(hist, processing_ts)
    diff = snapshot_diff(stg, current, key, attrs)
    # keys whose open version must be closed: changed, deleted, and
    # reborn (new key that still has an open tombstone). Tiny sets —
    # broadcast.
    open_tombstones = hist.filter(
        (F.col("effective_to") == max_ts_lit()) & (F.col("deleted_flg") == 1)
    ).select(key)
    reborn = diff.new.select(key).join(open_tombstones, on=key, how="left_semi")
    to_close = (
        diff.changed.select(key)
        .unionByName(diff.deleted.select(key))
        .unionByName(reborn)
        .distinct()
    )

    is_open = F.col("effective_to") == max_ts_lit()
    closing = hist.join(F.broadcast(to_close), on=key, how="left_semi").filter(
        is_open
    )
    # complement of `closing` without exceptAll (which would shuffle the
    # whole history on every column): anti-join-on-key ∪ already-closed
    untouched = hist.join(F.broadcast(to_close), on=key, how="left_anti").unionByName(
        hist.join(F.broadcast(to_close), on=key, how="left_semi").filter(~is_open)
    )
    closed = closing.withColumn("effective_to", closed_ts)

    def _versions(df: DataFrame, flg: int) -> DataFrame:
        return df.select(
            *cols,
            F.lit(flg).cast("int").alias("deleted_flg"),
            ts.alias("effective_from"),
            max_ts_lit().alias("effective_to"),
        )

    appended = (
        _versions(diff.new, 0)
        .unionByName(_versions(diff.changed, 0))
        .unionByName(_versions(diff.deleted, 1))
    )
    return untouched.select(hist.columns).unionByName(
        closed.select(hist.columns)
    ).unionByName(appended.select(hist.columns))


def scd1_append(
    fact: DataFrame, stg: DataFrame, key: str, attrs: list[str]
) -> DataFrame:
    """The blacklist "upsert" (S3) — returns rows to APPEND to the fact.

    Faithful to main.py:240-296 in its append-only shape: new rows
    (anti on key) plus *changed* rows appended WITHOUT removing the old
    version — README calls it SCD1 but the implementation is
    append-only, so a changed key ends up duplicated. The canonical
    keep-latest variant is :func:`scd1_latest`.

    One deliberate hardening over the literal reference (round-3 review
    finding): "changed" means the staged content exists for the key but
    matches NO fact row exactly (null-safe on every attr). The
    reference's literal inner-join-where-neq emits a staged row once
    per DIFFERING OLD VERSION — so after a key's first change, its
    UNCHANGED row re-appends on every subsequent run and the fact grows
    without bound (it also breaks scd1_latest's no-repeated-(key,order)
    precondition). On data the reference ever sees (versions are never
    revisited) the two definitions produce identical appends.
    """
    cols = [key, *attrs]
    stg = stg.select(*cols).alias("stg")
    fct = fact.select(*cols).alias("fct")
    new = stg.join(fct, on=key, how="left_anti")
    exact = F.col(f"stg.{key}") == F.col(f"fct.{key}")
    for a in attrs:
        exact = exact & F.col(f"stg.{a}").eqNullSafe(F.col(f"fct.{a}"))
    changed = (
        stg.join(fct, on=key, how="left_semi")  # key already present...
        .alias("stg")
        .join(fct, exact, "left_anti")  # ...but this exact content is not
        .select(*cols)
    )
    return new.unionByName(changed)


def scd1_latest(fact: DataFrame, key: str, order_col: str) -> DataFrame:
    """Canonical keep-latest view over the append-only SCD1 fact: one row
    per key, the one with the greatest ``order_col`` (deterministic
    because appends never repeat (key, order_col) pairs in this
    pipeline)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        fact.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
