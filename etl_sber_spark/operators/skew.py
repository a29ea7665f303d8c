"""Skew-mitigation operators (SURVEY.md §4.2 / the 100 TB doctrine).

AQE's skew-join splitting handles most runtime JOIN skew automatically
(session.py turns it on); what AQE does NOT fix is a hot GROUP key
whose per-key aggregation state lands on one reducer.
:func:`salted_agg` is the explicit two-stage remedy: stage 1 aggregates
on (key, salt), spreading a hot key over S reducers; stage 2 merges the
S partials. Works for any algebraic aggregate (sum/count/min/max —
caller passes the merge form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partials per keys (referencing the partial output columns). For a
    plain sum: partial = sum(x) AS s, merge = sum(s) AS s.

    The salt is PER ROW — ``pmod(hash(monotonically_increasing_id()),
    n_salts)`` — not per input partition. A per-partition salt
    (``spark_partition_id``, the round-2 version) degenerates exactly in
    the scenario salting targets: a hot key clustered into few input
    partitions (pre-shuffled or sorted input) would see only those few
    distinct salt values, so stage 1 would not spread it.
    ``monotonically_increasing_id`` is deterministic within a job
    (partition index × ordinal), and the salt column never leaves
    stage 1, so cross-job id instability cannot leak into results.

    Stage-1 cardinality is |keys| × n_salts, so a single hot key spreads
    over ``n_salts`` reducers instead of one; stage 2 shuffles only the
    tiny partial table. With map-side partial aggregation Spark already
    does much of this for algebraic aggs — salting matters when the
    per-key state is large (collect-style aggs) or AQE is disabled.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )
