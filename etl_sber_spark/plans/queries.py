"""Driver-facing query registry: Spark plan + DuckDB oracle per operator.

One named entry per operator row of SURVEY.md §2 (plus the LLM-pipeline
extensions). Each Spark callable takes ``(spark, sf_dir)`` and returns a
DataFrame; ``ORACLE[name]`` is the equivalent DuckDB SQL over the
pre-registered views. Contract rules (SURVEY.md §5.3):

- every computed column is aliased identically on both sides;
- floating aggregates are computed in DECIMAL (exact, order-independent)
  or rounded, never raw float sums;
- window orderings carry a unique-key tiebreak so results are
  deterministic in both engines.

Determinism note: testdata doubles are 2-decimal (verified), so
``CAST(x AS DECIMAL(18,2))`` is lossless and decimal sums are exact.

Output-type rule (round-2 fix for the 6 hash-red queries): aggregates are
computed EXACTLY in decimal, then the *output* column is cast to DOUBLE on
both sides. Rationale: the driver renders values through pandas, where
DuckDB decimals become float64 but Spark decimals stay ``Decimal`` objects
— ``Decimal('23720008.4600')`` vs ``23720008.46`` stringify differently
whenever the decimal has trailing zeros. Casting the same exact decimal to
double in both engines yields bit-identical IEEE doubles (the scaled
integer fits in 2**53, so both casts are correctly rounded), hence
identical renderings. Integer counters: DuckDB ``SUM(CASE…1…)`` returns
HUGEINT (float64 via pandas) — the oracle casts them to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.normalize import comma_decimal, portable_round
from ..operators.bandjoin import band_partner_groups
from ..sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _dec(col, p: int = 18, s: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(p, s))


# ---------------------------------------------------------------------------
# Flagship (entry point): revenue by region/nation — scan, filter, 5-way
# broadcast-able join chain, decimal agg, sort. Reference shape: the J6
# denormalized view + mart aggregation (main.py:392-421, 445-529).
# ---------------------------------------------------------------------------


@query(
    "q_flagship_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r.r_name, n.n_name
    """,
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # Dim tables (region/nation/customer) are tiny relative to the fact:
    # broadcast them so the only shuffle is lineitem⋈orders; at 100 TB the
    # orders join stays a shuffle join on the (co-partitionable) order key.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (o.o_orderdate >= F.lit("1996-01-01").cast("timestamp"))
            & (o.o_orderdate < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("region_name"), n.n_name.alias("nation_name"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / filters / projections (SURVEY §2.3-2.4: P1-P8, F2-F8)
# ---------------------------------------------------------------------------


@query(
    "q_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(CAST(regexp_replace(
                replace(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                        '.', ','),
                ',', '.') AS DECIMAL(20,2)) AS DOUBLE) AS amount
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount = 0.05
      AND l_quantity < 10
    """,
)
def q_scan_filter(spark, sf_dir):
    """F2 BETWEEN on timestamps + F3 equality + range filter, all pushed to
    the parquet scan (PushedFilters in .explain). The ``amount`` column
    is round-3's q_cast_decimal absorbed (§1.4 comma-decimal repair,
    main.py:324): build the dirty string ('68423,46'), repair it with
    the engine's comma_decimal normalizer — a projection above the same
    filtered scan, so the pushdown pin is untouched."""
    li = load_table(spark, sf_dir, "lineitem")
    dirty = F.replace(
        _dec("l_extendedprice").cast("string"), F.lit("."), F.lit(",")
    )
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & (F.col("l_discount") == 0.05)
        & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        comma_decimal(dirty).cast("double").alias("amount"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5: J1-J9)
# ---------------------------------------------------------------------------


@query(
    "q_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q_left_anti(spark, sf_dir):
    """J1-J3: the reference's LEFT JOIN … WHERE right IS NULL idiom
    (main.py:81-84, 99-102, 248-251) folded into a left_anti join.
    The right side is filtered (completed orders only) so the result is
    NON-empty on the testdata — a 0-row green would be weak evidence
    (the synthetic star schema has full referential coverage, so the
    unfiltered anti-join is empty). The semi twin (F4 IN-subquery →
    left_semi) is pinned by q_correlated_exists, whose EXISTS
    decorrelates to the identical physical join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    completed = o.filter(F.col("o_orderstatus") == "F")
    return c.join(completed, c.c_custkey == completed.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_changed_rows",
    oracle="""
    SELECT t1.l_orderkey AS order_key,
           t1.l_quantity AS qty_1, t2.l_quantity AS qty_2,
           t1.l_partkey  AS part_1, t2.l_partkey  AS part_2
    FROM (SELECT * FROM lineitem WHERE l_linenumber = 1) t1
    JOIN (SELECT * FROM lineitem WHERE l_linenumber = 2) t2
      ON t1.l_orderkey = t2.l_orderkey
     AND (t1.l_quantity <> t2.l_quantity OR t1.l_partkey <> t2.l_partkey)
    """,
)
def q_changed_rows(spark, sf_dir):
    """J4/J5: inner equi join + null-unsafe non-equi residual — the
    changed-rows detection of the snapshot diff (main.py:117-123, 264-267).
    Catalyst plans the equi part as the join key and the <> disjunction as
    a post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    t1 = li.filter(F.col("l_linenumber") == 1).alias("t1")
    t2 = li.filter(F.col("l_linenumber") == 2).alias("t2")
    cond = (F.col("t1.l_orderkey") == F.col("t2.l_orderkey")) & (
        (F.col("t1.l_quantity") != F.col("t2.l_quantity"))
        | (F.col("t1.l_partkey") != F.col("t2.l_partkey"))
    )
    return t1.join(t2, cond, "inner").select(
        F.col("t1.l_orderkey").alias("order_key"),
        F.col("t1.l_quantity").alias("qty_1"),
        F.col("t2.l_quantity").alias("qty_2"),
        F.col("t1.l_partkey").alias("part_1"),
        F.col("t2.l_partkey").alias("part_2"),
    )


@query(
    "q_multiway_join",
    oracle="""
    SELECT n.n_name AS nation_name, c.c_mktsegment AS segment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name, c.c_mktsegment
    """,
)
def q_multiway_join(spark, sf_dir):
    """J6: multi-way inner equi chain shaped like the denormalized view
    (main.py:409-419), dims broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_semi_union_rule1",
    oracle="""
    SELECT DISTINCT o_orderkey FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
       OR o.o_totalprice > 300000
    """,
)
def q_semi_union_rule1(spark, sf_dir):
    """J7 canonical: the reference's mixed AND/OR left join (main.py:467-471)
    rewritten as union-of-semi-join + filter + distinct (SURVEY §2.5 J7) —
    no BNLJ, scales linearly."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    arm1 = o.join(
        li.filter(F.col("l_returnflag") == "R"),
        o.o_orderkey == F.col("l_orderkey"),
        "left_semi",
    )
    arm2 = o.filter(F.col("o_totalprice") > 300000)
    return arm1.unionByName(arm2).select("o_orderkey").distinct()


@query(
    "q_band_selfjoin",
    oracle="""
    SELECT e1.event_id AS id_a, e2.event_id AS id_b
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type <> e2.event_type
     AND e1.ts <> e2.ts
     AND e1.ts BETWEEN e2.ts - INTERVAL 1 HOUR AND e2.ts + INTERVAL 1 HOUR
    """,
)
def q_band_selfjoin(spark, sf_dir):
    """J9 faithful: band (±1h interval) self-join keyed on an equi column
    (main.py:516-525). The user_id equi key bounds the quadratic term per
    key; Catalyst plans hash-join on user_id + residual band filter."""
    e = load_table(spark, sf_dir, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e1.event_type") != F.col("e2.event_type"))
        & (F.col("e1.ts") != F.col("e2.ts"))
        & F.col("e1.ts").between(
            F.col("e2.ts") - F.expr("INTERVAL 1 HOUR"),
            F.col("e2.ts") + F.expr("INTERVAL 1 HOUR"),
        )
    )
    return e1.join(e2, cond, "inner").select(
        F.col("e1.event_id").alias("id_a"), F.col("e2.event_id").alias("id_b")
    )


@query(
    "q_band_window",
    oracle="""
    SELECT user_id, event_id, event_type, prev_type
    FROM (
      SELECT user_id, event_id, event_type, ts,
             lag(event_type) OVER w AS prev_type,
             lag(ts)         OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE prev_type IS NOT NULL
      AND prev_type <> event_type
      AND ts - prev_ts <= INTERVAL 1 HOUR
    """,
)
def q_band_window(spark, sf_dir):
    """J9 scale path (SURVEY §4.3.2): the O(n^2)-per-key band self-join
    rewritten as a lag window per key ordered by time — one shuffle+sort,
    O(n log n); this is the default physical strategy at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
            # exact (microsecond-preserving) band check: prev_ts <= ts is
            # implied by the window order, so only the upper bound remains.
            # Casting to long would truncate to whole seconds and admit
            # pairs up to 3600.999999s apart — diverging from the oracle.
            & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .select("user_id", "event_id", "event_type", "prev_type")
    )


# ---------------------------------------------------------------------------
# Aggregation / dedup / set ops (SURVEY §2.6, §2.8: A1-A2, S-ops, unions)
# ---------------------------------------------------------------------------


@query(
    "q_agg_sum_by_key",
    oracle="""
    SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           AVG(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_sum_by_key(spark, sf_dir):
    """TPC-H Q1 shape: partial (map-side) aggregation + single shuffle on the
    group keys; decimal sums are exact and order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_groupby_dedup",
    oracle="SELECT user_id, event_type FROM events GROUP BY user_id, event_type",
)
def q_groupby_dedup(spark, sf_dir):
    """A1: GROUP BY with no aggregate functions — dedup projection
    (main.py:472). ``GROUP BY k`` with an empty select list is exactly
    ``dropDuplicates`` on the keys; both plan a single hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


@query(
    "q_conditional_agg",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS purchase_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_conditional_agg(spark, sf_dir):
    """Pivot-shaped conditional aggregation (the scalable form of
    .pivot(): no second pass to discover pivot values), plus a DISTINCT
    aggregate alongside the plain ones (absorbed round-3's
    q_distinct_agg) — the mix forces Spark's Expand + two-stage
    aggregate physical shape; at scale the distinct key shuffles once."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n_click"
        ),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchase"
        ),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_error"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", _dec("value")).otherwise(
                _dec(F.lit(0))
            )
        )
        .cast("double")
        .alias("purchase_value"),
        F.count_distinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Grouping-sets family (consolidates round-2's q_rollup + q_cube into
    one driver row): the explicit four-set GROUPING SETS — the CUBE of the
    two keys, of which ROLLUP is the prefix subset — with GROUPING()
    markers so NULL group values are unambiguous. Plans as one Expand +
    one shuffle in Spark; hierarchical and total rows come from the same
    pass, not separate scans."""
    from ..operators.spread import spread

    # spread(): the Expand quadruples every input row BEFORE the
    # aggregate's exchange, and the lineitem scan plans as 3 splits at
    # sf0.1 — fanning the scan out parallelizes the Expand + partial
    # aggregate (r6; 1.59 -> 1.03 s min-of-3). No-op on a real
    # warehouse scan. The view is registered from the spread frame;
    # every query registers the views it reads (r5 discipline), so
    # this cannot leak into another query's plan.
    spread(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.7: W1-W2) + top-k
# ---------------------------------------------------------------------------


@query(
    "q_window_funcs",
    oracle="""
    SELECT event_id, user_id,
           lead(event_type) OVER w_time AS next_type,
           lag(event_type)  OVER w_time AS prev_type,
           first_value(event_type) OVER w_time AS first_type,
           nth_value(event_type, 2) OVER w_time AS second_type,
           dense_rank() OVER w_type AS type_rank,
           ntile(4) OVER w_time AS quartile,
           floor((percent_rank() OVER w_val) * 1000000.0 + 0.5) / 1000000.0
               AS val_pct_rank,
           floor((cume_dist() OVER w_val) * 1000000.0 + 0.5) / 1000000.0
               AS val_cume_dist
    FROM events
    WINDOW w_time AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_type AS (PARTITION BY user_id ORDER BY event_type),
           w_val  AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def q_window_funcs(spark, sf_dir):
    """The analytic window-function battery in one projection
    (consolidates round-2's q_lead + q_dense_rank; widened in round 4
    with the rest of the standard surface):

    - W1 lead(city) per client ordered by event time (main.py:505), with
      the unique-key tiebreak canonicalization (SURVEY §2.7) — plus lag,
      first_value and nth_value on the same running frame;
    - W2 dense_rank per partition (main.py:506, 527-528 — 'client seen
      in a second distinct city'); the rank=2 RESIDUAL FILTER (F9) and
      the composed rule stay pinned by q_fraud_rule3_shape and q_topk;
    - distribution functions: ntile(4), percent_rank, cume_dist —
      quantized with the portable floor(x*1e6+0.5)/1e6 (NOT engine
      round(): percent_rank is a small-denominator rational, the class
      where Spark's shortest-decimal HALF_UP and DuckDB's scaled
      std::round can disagree — the q_curate sf0.1 lesson).

    Three window specs over the same partition key plan as ONE shuffle —
    Spark reuses the hash partitioning across the per-ordering sorts."""
    e = load_table(spark, sf_dir, "events")
    w_time = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("next_type"),
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
        F.first("event_type").over(w_time).alias("first_type"),
        F.nth_value("event_type", 2).over(w_time).alias("second_type"),
        F.dense_rank().over(w_type).alias("type_rank"),
        F.ntile(4).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("quartile"),
        portable_round(F.percent_rank().over(w_val), 6).alias(
            "val_pct_rank"
        ),
        portable_round(F.cume_dist().over(w_val), 6).alias(
            "val_cume_dist"
        ),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderpriority AS priority, o_orderkey, o_totalprice, rn AS rank_in_priority
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk(spark, sf_dir):
    """Two-phase top-K per group.

    ``o_orderpriority`` has only 5 distinct values, so a single
    ``Window.partitionBy(priority)`` would shuffle the WHOLE fact into 5
    reducer partitions — a scale-killer at 100 TB. Phase 1 takes a local
    top-3 within each (priority, input-partition) slice — parallelism =
    input partition count, and each slice emits at most 3 rows. Phase 2
    ranks the surviving ≤ 3×P rows per priority — a tiny window. The
    ordering (o_totalprice DESC, o_orderkey) is total, so local top-3 is
    guaranteed to contain the global top-3.
    """
    o = load_table(spark, sf_dir, "orders")
    local = o.select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        "o_totalprice",
        F.spark_partition_id().alias("_slice"),
    )
    w_local = Window.partitionBy("priority", "_slice").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    survivors = (
        local.withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= 3)
        .drop("_slice", "_rn")
    )
    w_global = Window.partitionBy("priority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return survivors.withColumn(
        "rank_in_priority", F.row_number().over(w_global)
    ).filter(F.col("rank_in_priority") <= 3)


@query(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM events
    """,
)
def q_window_running(spark, sf_dir):
    """Aggregate window with an explicit ROWS frame (running total),
    decimal-exact so the prefix sums hash identically."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# SCD machinery as a flattened differential query (SURVEY §2.6 S1+S2,
# §7.6 q_scd2_snapshot) + P4 format parsing
# ---------------------------------------------------------------------------


@query(
    "q_scd2_snapshot",
    oracle="""
    WITH a AS (SELECT l_orderkey AS k, MIN(l_partkey) AS p, MIN(l_quantity) AS q
               FROM lineitem WHERE l_linenumber = 1 GROUP BY l_orderkey),
         b AS (SELECT l_orderkey AS k, MIN(l_partkey) AS p, MIN(l_quantity) AS q
               FROM lineitem WHERE l_linenumber = 2 GROUP BY l_orderkey),
         changed AS (SELECT a.k FROM a JOIN b ON a.k = b.k
                     WHERE a.p <> b.p OR a.q <> b.q),
         deleted AS (SELECT a.k FROM a WHERE a.k NOT IN (SELECT k FROM b)),
         closing AS (SELECT k FROM changed UNION SELECT k FROM deleted)
    SELECT a.k AS order_key, a.p AS part_key, a.q AS qty,
           0 AS deleted_flg,
           '2024-01-01 00:00:00' AS effective_from,
           CASE WHEN a.k IN (SELECT k FROM closing)
                THEN '2024-01-01 23:59:59'
                ELSE '2999-12-31 23:59:59' END AS effective_to
    FROM a
    UNION ALL
    SELECT b.k, b.p, b.q, 0,
           '2024-01-02 00:00:00', '2999-12-31 23:59:59'
    FROM b WHERE b.k NOT IN (SELECT k FROM a)
    UNION ALL
    SELECT b.k, b.p, b.q, 0,
           '2024-01-02 00:00:00', '2999-12-31 23:59:59'
    FROM b WHERE b.k IN (SELECT k FROM changed)
    UNION ALL
    SELECT a.k, a.p, a.q, 1,
           '2024-01-02 00:00:00', '2999-12-31 23:59:59'
    FROM a WHERE a.k IN (SELECT k FROM deleted)
    """,
)
def q_scd2_snapshot(spark, sf_dir):
    """S1+S2 flattened: open an SCD2 history from snapshot A (lineitem
    linenumber=1 keyed by order), apply snapshot B (linenumber=2) via the
    engine's snapshot_diff + scd2_apply (operators/scd.py), and emit the
    complete next history. The oracle recomputes the same close-out /
    new-version / tombstone algebra in pure SQL — a true differential
    test of the composite operator the reference runs nightly
    (main.py:72-188).

    Output contract (round-3 fix): effective_from/effective_to are emitted
    as 'yyyy-MM-dd HH:mm:ss' STRINGS on both sides. The SCD2 open-version
    sentinel 2999-12-31 23:59:59 overflows pandas ns-resolution timestamps,
    which is the rendering channel the driver hashes through — the
    timestamps stay native inside the engine (operators/scd.py), only this
    query's output projection formats them."""
    import datetime as dt

    from ..operators.scd import scd2_apply
    from ..functions.normalize import max_ts_lit

    li = load_table(spark, sf_dir, "lineitem")

    def snap(linenumber: int) -> DataFrame:
        # the synthetic lineitem repeats linenumbers per order, so a
        # snapshot needs explicit key-uniqueness: min-aggregate per key.
        # Pinned: the SCD2 apply reads each snapshot 3× (diff legs +
        # history complement) — unmaterialized that is 6 lineitem
        # scans/aggregations instead of 2. (A fused single-scan variant
        # with conditional min-aggs was measured SLOWER — 2.5s vs 1.95s
        # at sf0.1: two pushdown-filtered scans with simple aggs beat
        # one scan aggregating twice the rows with when()-guarded aggs.)
        from ..operators.materialize import pin

        return pin(
            li.filter(F.col("l_linenumber") == linenumber)
            .groupBy(F.col("l_orderkey").alias("order_key"))
            .agg(
                F.min("l_partkey").alias("part_key"),
                F.min("l_quantity").alias("qty"),
            )
        )

    a, b = snap(1), snap(2)
    ts0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ts1 = dt.datetime(2024, 1, 2, 0, 0, 0)
    hist0 = a.select(
        "order_key",
        "part_key",
        "qty",
        F.lit(0).cast("int").alias("deleted_flg"),
        F.lit(ts0).cast("timestamp").alias("effective_from"),
        max_ts_lit().alias("effective_to"),
    )
    out = scd2_apply(hist0, b, "order_key", ["part_key", "qty"], ts1)
    return out.select(
        "order_key",
        "part_key",
        "qty",
        "deleted_flg",
        F.date_format("effective_from", "yyyy-MM-dd HH:mm:ss").alias(
            "effective_from"
        ),
        F.date_format("effective_to", "yyyy-MM-dd HH:mm:ss").alias("effective_to"),
    )


@query(
    "q_fraud_rule3_shape",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT t2.ts AS trans_ts, t1.user_id, t2.event_type
      FROM events t1
      JOIN events t2
        ON t1.user_id = t2.user_id
       AND t1.event_type <> t2.event_type
       AND t1.ts <> t2.ts
       AND t1.ts BETWEEN t2.ts - INTERVAL 1 HOUR AND t2.ts + INTERVAL 1 HOUR
    ),
    flagged AS (
      SELECT trans_ts, user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY trans_ts, event_type) AS next_type,
             dense_rank() OVER (PARTITION BY user_id
                                ORDER BY event_type) AS rnk
      FROM pairs
    )
    SELECT DISTINCT trans_ts AS event_dt, user_id
    FROM flagged
    WHERE next_type IS NOT NULL AND event_type <> next_type AND rnk = 2
    """,
)
def q_fraud_rule3_shape(spark, sf_dir):
    """The COMPLETE composed fraud rule 3 (main.py:489-529) on testdata,
    in its round-3 DEFAULT plan shape: window EXISTS rewrite of the band
    self-join (operators/bandjoin.py — no pair product materializes) →
    lead + dense_rank windows (W1-W2) → residual filters (F8-F9) →
    distinct projection. Same operator chain as
    plans/fraud.py:rule_city_hopping with events standing in for the
    transaction view (user_id≙card, event_type≙city, ts≙trans date).
    The DuckDB oracle still runs the LITERAL band join + DISTINCT, so
    the driver's hash compare proves the rewrite row-identical to the
    reference shape — the composed pipeline AND the join-elimination
    algebra are both correctness-graded."""
    e = load_table(spark, sf_dir, "events")
    pairs = band_partner_groups(
        e.select("user_id", "event_type", "ts"), ["user_id"], "ts", "event_type"
    ).select(
        F.col("ts").alias("trans_ts"),
        "user_id",
        "event_type",
    )
    w_lead = Window.partitionBy("user_id").orderBy("trans_ts", "event_type")
    w_rank = Window.partitionBy("user_id").orderBy("event_type")
    flagged = pairs.select(
        "trans_ts",
        "user_id",
        "event_type",
        F.lead("event_type").over(w_lead).alias("next_type"),
        F.dense_rank().over(w_rank).alias("rnk"),
    )
    return (
        flagged.filter(
            F.col("next_type").isNotNull()
            & (F.col("event_type") != F.col("next_type"))
            & (F.col("rnk") == 2)
        )
        .select(F.col("trans_ts").alias("event_dt"), "user_id")
        .distinct()
    )


@query(
    "q_self_rejoin",
    oracle="""
    SELECT k.user_id, k.last_ts, e.event_id, e.event_type
    FROM (SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id) k
    JOIN events e ON e.user_id = k.user_id AND e.ts = k.last_ts
    """,
)
def q_self_rejoin(spark, sf_dir):
    """J8: derived keys inner-rejoined to the base table to re-attach
    attributes (main.py:473-474 — derived (client_id, event_dt) ⋈ view).
    Here: each user's latest timestamp rejoined to recover the event
    row(s) at that instant."""
    e = load_table(spark, sf_dir, "events")
    keys = e.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    return keys.join(
        e, (keys.user_id == e.user_id) & (keys.last_ts == e.ts), "inner"
    ).select(keys.user_id, "last_ts", "event_id", "event_type")


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark, sf_dir):
    """Skew-safe two-stage aggregation (operators/skew.py): event_type
    has only ~5 distinct values — the degenerate-cardinality case where
    a plain groupBy sends everything to 5 reducers. Stage 1 aggregates
    on (key, salt); stage 2 merges partials. Result is identical to the
    plain GROUP BY (the oracle)."""
    from ..operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        partial_aggs={
            "pv": F.sum(_dec("value")),
            "pn": F.count(F.lit(1)),
        },
        merge_aggs={
            "total_value": F.sum(F.col("pv")).cast("double"),
            "n": F.sum(F.col("pn")).cast("long"),
        },
    )
    return out.select("event_type", "total_value", "n")


@query(
    "q_window_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS hour_value
    FROM events
    """,
)
def q_window_range(spark, sf_dir):
    """RANGE-frame window: per-user rolling 1-hour sum ordered by event
    time (microsecond epoch) — the time-series rolling aggregate the
    band-join family approximates, as a single shuffle+sort. Decimal
    internally (order-independent), DOUBLE out."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("hour_value"),
    )


@query(
    "q_time_bucket_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_time_bucket_rollup(spark, sf_dir):
    """Hypertable-style time-bucket rollup: hourly × event_type
    aggregate — the continuous-aggregate shape (one shuffle on (bucket,
    type); at scale the bucket column is also the natural partition for
    a materialized rollup table)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev
        FROM events
    ),
    f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev IS NULL
                         OR epoch_us(ts) - epoch_us(prev) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM o
    ),
    s AS (
        SELECT user_id, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) - 1
                   AS session_seq
        FROM f
    )
    SELECT user_id, event_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(user_id * 4294967296 + session_seq AS BIGINT) AS session_id
    FROM s
    """,
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (operators/sessionize.py): every event
    assigned its user's session (30-minute inactivity gap) via
    lag → new-session flag → running sum — ONE shuffle (the per-user
    window). The oracle replays the identical window algebra; the
    native session_window formulation (and its streaming twin) is
    proven equal to this one in tests/test_sessionize.py /
    test_streaming_sessions.py, so hash-grading this row pins all
    three."""
    from ..operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", "event_id", gap_minutes=30)
    return s.select(
        "user_id",
        "event_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        F.col("session_id").cast("long").alias("session_id"),
    )


@query(
    "q_gapfill",
    oracle="""
    WITH b AS (
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2
    ),
    sp AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, INTERVAL 21600 SECONDS))
                   AS bucket
        FROM (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
              FROM b GROUP BY 1)
    ),
    j AS (
        SELECT sp.user_id, sp.bucket, b.n_events, b.value_sum
        FROM sp LEFT JOIN b
          ON b.user_id = sp.user_id AND b.bucket = sp.bucket
    )
    SELECT user_id, bucket,
           COALESCE(n_events, 0) AS n_events,
           last_value(value_sum IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_locf,
           (n_events IS NULL) AS is_gap
    FROM j
    """,
)
def q_gapfill(spark, sf_dir):
    """Time-series regularization (operators/timeseries.py): 6-hour
    buckets per user, dense calendar spine generated per key
    (sequence(), no shuffle), gaps filled by last-observation-carried-
    forward with an is_gap marker. The spine is keys × steps —
    independent of event volume — and the LOCF window runs on the
    bucketed frame, so the operator's cost at 100 TB is the ONE
    resample aggregate plus a metadata-sized calendar.

    The graded projection drops the operator's raw ``value_sum`` column:
    it is NULL exactly on gap rows, and a NULL double renders as NaN on
    the driver's DuckDB-pandas path but None on the Spark side — a
    guaranteed hash mismatch (the r1 decimal lesson, SURVEY §5.3).
    ``is_gap`` + ``value_locf`` carry the same information; LOCF itself
    is never NULL because each key's spine starts at its first OBSERVED
    bucket."""
    from ..operators.timeseries import gap_fill

    e = load_table(spark, sf_dir, "events")
    return gap_fill(e, "user_id", "ts", "value", step_seconds=21600).drop(
        "value_sum"
    )


@query(
    "q_set_ops",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
    """,
)
def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT (set semantics): users who clicked AND
    purchased, minus users with a high-value error. Spark's
    intersect/exceptAll-distinct match SQL set semantics; both plan as
    aggregated semi/anti joins. Also the driver pin for A2 SELECT
    DISTINCT (main.py:458, 499) — set semantics ARE distinct semantics
    (the final .distinct() is the operator; round-2's standalone
    q_distinct row was consolidated in here, and q_groupby_dedup pins
    the GROUP BY spelling). The EXCEPT leg is value-filtered so the
    result is NON-empty on the testdata (every synthetic user emits
    every event type, so the unfiltered EXCEPT was a weak 0-row green
    in round 2)."""
    e = load_table(spark, sf_dir, "events")

    def users(t):
        return e.filter(F.col("event_type") == t).select("user_id")

    errored = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 95))
        .select("user_id")
        .distinct()
    )
    return (
        users("click").intersect(users("purchase")).exceptAll(errored).distinct()
    )


@query(
    "q_percentile",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS med_value,
           quantile_cont(value, 0.9) AS p90_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_percentile(spark, sf_dir):
    """Exact interpolated percentiles (median/p90) per group — Spark's
    percentile and DuckDB's quantile_cont share the standard
    (1-f)*lo + f*hi interpolation, verified bit-identical on this data.
    Exact percentile sorts per group; the approximate sketch path
    (approx_percentile/t-digest) is the 100 TB default when a 1% error
    is acceptable — bounds-tested in tests/test_approx.py since sketches
    are not cross-engine comparable."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med_value"),
        F.percentile("value", F.lit(0.9)).alias("p90_value"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_scalar_funcs",
    oracle="""
    SELECT e.event_id,
           concat_ws(' ', c.c_name, c.c_mktsegment,
                     nullif(e.event_type, 'click')) AS label,
           upper(c.c_name) AS name_upper,
           lower(c.c_mktsegment) AS seg_lower,
           substr(c.c_name, 1, 8) AS name_prefix,
           lpad(CAST(c.c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c.c_name, '#', '-') AS name_dashed,
           length(c.c_name) AS name_len,
           coalesce(nullif(c.c_mktsegment, 'BUILDING'), 'OTHER')
               AS seg_or_other,
           CASE WHEN c.c_acctbal IS NULL THEN -1.0 ELSE c.c_acctbal END
               AS acctbal_filled,
           (c.c_mktsegment IS NOT NULL) AS has_segment,
           CAST(e.ts AS DATE) AS event_date,
           strptime(strftime(e.ts, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS ts_parsed,
           CAST(strptime(strftime(e.ts, '%Y-%m-%d'), '%Y-%m-%d') AS DATE)
               AS date_parsed,
           e.ts + INTERVAL 1 HOUR  AS ts_plus_1h,
           e.ts - INTERVAL 1 SECOND AS ts_minus_1s,
           CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k_val
    FROM events e
    JOIN customer c ON c.c_custkey = (e.user_id % 1000) + 1
    """,
)
def q_scalar_funcs(spark, sf_dir):
    """Scalar-function surface, one driver row (consolidates round-2's
    q_string_funcs + q_null_funcs, round-3's q_project_concat, and
    round-4's merge of q_datetime_funcs — freeing grading-window slots
    for new operators while keeping every §2 pin):

    - P2 Oracle ``||`` concat → concat_ws (NULL-as-empty semantics,
      main.py:396) — the ``label`` column, with a GENUINE NULL argument
      (nullif on 'click' rows) so the NULL-is-empty behavior is in the
      hashed output, not just the expression;
    - strings: upper/lower/substr/lpad/replace/length — all JVM
      built-ins with identical semantics in DuckDB for positive
      arguments (negative substr indexes differ between engines and are
      avoided by contract);
    - NULL handling: coalesce / nullif / IS NULL projection — the
      Oracle NVL/NVL2 idioms (reference §2.4 F1/F8 family);
    - P6 trunc(timestamp)→date (main.py:417, 470-471) → to_date(ts);
    - P4 to_timestamp(str, fmt) (main.py:370) round-tripped through a
      formatted string so the format PARSER is exercised, with the
      Oracle→Java format-dialect translation;
    - P5 to_date(str, fmt) (blacklist date parse, main.py:232-246);
    - P8 Oracle day-fraction arithmetic (sysdate ± 1/24/60/60,
      main.py:133, 525) → INTERVAL literals;
    - JSON property extraction (round-3's q_json_extract) — ``k_val``.

    The events⋈customer equi-join on a derived key gives the projection
    both a timestamp+JSON source and a NULL-bearing string dimension in
    ONE scan pair; the dim side broadcasts (tiny), so the battery stays
    scan-shaped at any scale."""
    from ..operators.spread import spread

    # spread(): the events file plans as ONE split at bench SFs, so the
    # whole 17-expression battery (two timestamp format round-trips
    # included) otherwise runs on a single task (r6; 1.15 -> 0.66 s
    # min-of-3 at sf0.1 — the residual is the 100k-row exchange). At warehouse scale the scan has real splits and spread is
    # a no-op.
    e = spread(load_table(spark, sf_dir, "events"))
    c = load_table(spark, sf_dir, "customer")
    joined = e.join(
        F.broadcast(c),
        (F.pmod(F.col("user_id"), F.lit(1000)) + F.lit(1)) == c.c_custkey,
    )
    return joined.select(
        "event_id",
        F.concat_ws(
            " ",
            F.col("c_name"),
            F.col("c_mktsegment"),
            F.nullif(F.col("event_type"), F.lit("click")),
        ).alias("label"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.length("c_name").alias("name_len"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(F.col("c_acctbal").isNull(), F.lit(-1.0))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal_filled"),
        F.col("c_mktsegment").isNotNull().alias("has_segment"),
        F.to_date("ts").alias("event_date"),
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ts_parsed"),
        F.to_date(F.date_format("ts", "yyyy-MM-dd"), "yyyy-MM-dd").alias(
            "date_parsed"
        ),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts_plus_1h"),
        (F.col("ts") - F.expr("INTERVAL 1 SECOND")).alias("ts_minus_1s"),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_id, MAX(value) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(c.click_id AS VARCHAR) AS click_id_right,
           CAST(c.click_value AS VARCHAR) AS click_value_right,
           CAST(c.ts AS VARCHAR) AS ts_right
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py): each purchase matched to the
    user's LATEST click at or before purchase time. Spark has no native
    ASOF — the operator is the one-shuffle union-window rewrite; the
    oracle uses DuckDB's NATIVE ASOF LEFT JOIN, so two independent
    as-of implementations must agree exactly (verified: 0 keyed
    differences over 1,981 purchases). Right side deduped to one row
    per (user, ts) — the operator's documented precondition.

    Rendering note: the matched columns are NULLABLE, and on the
    driver's pandas path DuckDB renders nullable BIGINT/DOUBLE as
    float64 ('205.0') and nullable TIMESTAMP as NaT, while Spark keeps
    typed NULLs — so nullable non-string columns cross the comparison
    boundary as VARCHAR on both sides (None stays None in object
    columns)."""
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.max("value").alias("click_value"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, key="user_id", ts="ts",
        right_cols=["click_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("click_id_right").cast("string").alias("click_id_right"),
        F.col("click_value_right").cast("string").alias("click_value_right"),
        F.col("ts_right").cast("string").alias("ts_right"),
    )


@query(
    "q_range_join",
    oracle="""
    SELECT i.o_orderkey AS interval_id,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM lineitem p
    JOIN (SELECT o_orderkey, o_orderdate AS iv_start,
                 o_orderdate + INTERVAL 7 DAY AS iv_end
          FROM orders WHERE o_totalprice > 480000) i
      ON p.l_shipdate BETWEEN i.iv_start AND i.iv_end
    GROUP BY i.o_orderkey
    """,
)
def q_range_join(spark, sf_dir):
    """Range join (operators/rangejoin.py): lineitem ship events counted
    into 7-day order windows. The naive BETWEEN join is a BNLJ
    (O(points × intervals)); the bin-bucketed rewrite equi-joins on the
    time bin with the BETWEEN as residual — hash join, explode factor
    ≤ 2. The oracle computes the naive join, so the rewrite's exactness
    is what's being graded."""
    from ..operators.rangejoin import point_in_interval_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    intervals = o.filter(F.col("o_totalprice") > 480000).select(
        "o_orderkey",
        F.col("o_orderdate").alias("iv_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("iv_end"),
    )
    joined = point_in_interval_join(
        li.select("l_orderkey", "l_shipdate"),
        "l_shipdate",
        intervals,
        "iv_start",
        "iv_end",
        bin_days=7,
    )
    return joined.groupBy(F.col("o_orderkey").alias("interval_id")).agg(
        F.count(F.lit(1)).alias("n_points")
    )


@query(
    "q_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    """,
)
def q_correlated_exists(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS through the Spark SQL surface —
    Catalyst decorrelates both into semi/anti joins (the same physical
    shape as q_left_anti's hand-written join, exercising the subquery
    rewrite path instead). This row is also the F4 pin (IN-subquery →
    left_semi, main.py:134, 140): the decorrelated EXISTS leg IS the
    left-semi physical join."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        """
    )


@query(
    "q_array_funcs",
    oracle=r"""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\s+')))[1:5], ',')
               AS first_tokens,
           len(list_distinct(
               regexp_split_to_array(lower(trim(text)), '\s+'))) AS n_unique,
           list_contains(regexp_split_to_array(lower(trim(text)), '\s+'),
                         'spark') AS has_spark
    FROM documents
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array-function surface over tokenized text: sort, distinct,
    slice, size, contains — all JVM array built-ins (the column-typed
    path LLM pipelines use for token/shingle features). The array output
    is serialized with array_join: raw array columns render as numpy
    arrays on the driver's DuckDB-pandas path ("['a' 'b']") but Python
    lists on the Spark side ("['a', 'b']") — a guaranteed hash mismatch,
    so arrays cross the comparison boundary as strings."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return d.select(
        "doc_id",
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), ","
        ).alias("first_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


# Register the LLM-pipeline extension queries (dedup / minhash-LSH /
# similarity / text stats / multimodal) into the same QUERIES/ORACLE
# registry. Imported last: llm_queries imports `query` from this module.
from . import llm_queries  # noqa: E402,F401  (registration side effect)
