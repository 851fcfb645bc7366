"""Extended join/aggregation surface: TPC-H-shaped plans the generic engine
owes beyond the reference's own operator set (SURVEY §2.3 note: the reference
has no fact-fact joins at all), plus the two classic time-series joins Spark
lacks as built-ins — as-of join and bounded range join — re-expressed as
compositions of existing DataFrame ops (union+window, bin-bucketed equi-join).

Scale notes (100 TB):
* ``q6``: pure scan-filter-agg — predicates push to the parquet reader, no
  shuffle past the final single-row combine.
* ``q4``/``q2`` shapes: semi-join and argmax-per-group; both one shuffle.
* As-of join: the naive formulation (per-left-row subquery) is O(n·m); the
  union + ``last(ignorenulls)`` running-window form here is one shuffle on
  user_id (high cardinality → even spread) and linear in rows per user —
  the standard scalable as-of shape (same trick as Flink temporal joins).
* Range join: a raw inequality self-join is O(n²) per user; bucketing both
  sides into fixed time bins and equi-joining on (user, bin±1) bounds each
  probe to two bins, turning it into a hash join AQE can handle; the exact
  inequality is applied as a residual filter.
* Salted aggregation: two-phase groupBy((key, salt)) → groupBy(key) splits a
  hot key across `SALT_N` reducers — the manual fallback when AQE skew
  handling can't help (single-key hash agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table

_NS = 1_000_000_000


# --------------------------------------------------------------------------
# TPC-H Q6 shape: scan → pushed-down conjunctive filter → ungrouped agg.
# --------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates reach the parquet scan (PushedFilters); the agg is
    partial-combined per task, one row crosses the exchange. Money sums in
    DECIMAL (the repo-wide rule, cf. q10): double accumulation is
    partition-order-dependent, so a half-way total could flip a cent under
    round() between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join then grouped count.
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape: correlated scalar subquery (max within group) — expressed
# as an argmax join against a broadcast per-group aggregate.
# --------------------------------------------------------------------------
@query(
    "q2_max_bal_supplier",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS nationkey,
           round(s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def q2_max_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated max subquery → inner join with the grouped max (broadcast:
    one row per nation). Ties keep all rows, matching the SQL semantics —
    unlike a row_number()=1 rewrite, which would drop them."""
    sup = load_table(spark, sf_dir, "supplier")
    mx = (
        sup.groupBy(F.col("s_nationkey").alias("_nk"))
        .agg(F.max("s_acctbal").alias("_mx"))
    )
    return (
        sup.join(
            F.broadcast(mx),
            (F.col("s_nationkey") == F.col("_nk"))
            & (F.col("s_acctbal") == F.col("_mx")),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("s_nationkey").cast("long").alias("nationkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# --------------------------------------------------------------------------
# GROUPING SETS (generic surface; rollup/cube live in relational.py).
# --------------------------------------------------------------------------
@query(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# As-of join (NOT a Spark built-in): for every click, the value of the same
# user's most recent purchase at-or-before the click. Composition: aggregate
# the right side to unique (user, ts), union both sides, one running window
# with last(ignorenulls) — a single shuffle on user_id.
# --------------------------------------------------------------------------
@query(
    "asof_join_last_purchase",
    oracle="""
    SELECT c.event_id, c.user_id,
           (c.ts_us // 1000000) AS click_ts_s,
           round(p.mx_value, 2) AS last_purchase_value
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS mx_value
                    FROM events WHERE event_type = 'purchase'
                    GROUP BY user_id, epoch_us(ts)) p
      ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
    """,
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time axis is int64 microseconds on both engines (DuckDB stores
    parquet TIMESTAMP(NANOS) at micro precision; Spark truncates its raw
    nanos with integer `div` — identical semantics, no float rounding)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("(ts - pmod(ts, 1000)) div 1000")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(None).cast("double").alias("mx_value"),
        F.lit(1).alias("_src"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("mx_value"))
        .select(
            "user_id",
            "ts_us",
            F.lit(None).cast("long").alias("event_id"),
            "mx_value",
            F.lit(0).alias("_src"),
        )
    )
    # _src orders a purchase before a click at the same ts → ties count,
    # matching ASOF's `>=` bound.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("_last", F.last("mx_value", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_us div 1000000").alias("click_ts_s"),
            F.round("_last", 2).alias("last_purchase_value"),
        )
    )


# --------------------------------------------------------------------------
# Bounded range self-join (NOT a Spark built-in as an operator): event pairs
# of the same user within 300 s, made scalable by bin-bucketing: equi-join on
# (user, bin) with the left side exploded to {bin, bin+1}, inequalities as a
# residual filter. Turns an O(n² per user) theta-join into a hash join.
# --------------------------------------------------------------------------
@query(
    "range_join_event_pairs",
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs,
           round(sum(b.value - a.value), 2) AS sum_delta
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
    GROUP BY a.user_id
    """,
)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All time arithmetic in int64 microseconds — exact on both engines;
    the right event is bucketed to one bin, the left probes {bin, bin+1}."""
    win_us = 300 * 1_000_000
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("(ts - pmod(ts, 1000)) div 1000").alias("ts_us"),
            "value",
        )
    )
    bin_col = F.expr(f"ts_us div {win_us}")
    left = ev.select(
        F.col("user_id"),
        F.col("ts_us").alias("a_ts"),
        F.col("value").alias("a_value"),
        F.explode(F.array(bin_col, bin_col + 1)).alias("bin"),
    )
    right = ev.select(
        F.col("user_id"),
        F.col("ts_us").alias("b_ts"),
        F.col("value").alias("b_value"),
        bin_col.alias("bin"),
    )
    return (
        left.join(right, ["user_id", "bin"])
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") - F.col("a_ts") <= F.lit(win_us))
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("b_value") - F.col("a_value")), 2).alias("sum_delta"),
        )
    )


# --------------------------------------------------------------------------
# Salted two-phase aggregation: the manual skew-splitting pattern. Result is
# identical to a plain groupBy — the salt is internal.
# --------------------------------------------------------------------------
SALT_N = 16


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS sum_price,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 1 aggregates (key, hash(row)%N) — a hot key spreads over N
    reducers; phase 2 combines N partials per key. Low-cardinality group keys
    (3 return flags here) are exactly when this matters. Partials sum in
    DECIMAL so the two-phase total is order-independent and cent-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "_salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT_N))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("_sum"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("_sum"), 2).cast("double").alias("sum_price"),
        F.sum("_cnt").alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Spatial self-join via grid bucketing (no cross product).
# --------------------------------------------------------------------------
_GRID = 10_000  # world size per axis
_RADIUS = 150   # neighbor radius == grid cell size


def _xy_sql() -> str:
    from ..functions.hashing import sql_hash48

    hx = sql_hash48("CAST(c_custkey AS VARCHAR)")
    hy = sql_hash48("'y' || CAST(c_custkey AS VARCHAR)")
    return (
        f"SELECT c_custkey, {hx} % {_GRID} AS x, {hy} % {_GRID} AS y "
        "FROM customer"
    )


def _spatial_oracle() -> str:
    return f"""
    WITH pts AS ({_xy_sql()})
    SELECT a.c_custkey AS custkey,
           count(*) AS n_neighbors,
           min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
               AS min_dist2
    FROM pts a JOIN pts b
      ON a.c_custkey <> b.c_custkey
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {_RADIUS * _RADIUS}
    GROUP BY a.c_custkey
    """


@query("spatial_grid_join", oracle=_spatial_oracle())
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join over synthetic planar points (hash-derived from
    custkey, shared constants with the oracle): each point's neighbors
    within R. The scale pattern is GRID BUCKETING — the probe side explodes
    to its 3x3 neighbor cells (cell = R), the build side buckets to one
    cell, and the join is a plain equi-join on cell; candidate pairs are
    bounded by local density, never n². Distances are pure integer math.
    The oracle is the independent brute-force n² form."""
    from ..functions.hashing import hash48

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (hash48(F.col("c_custkey").cast("string")) % _GRID).alias("x"),
        (
            hash48(F.concat(F.lit("y"), F.col("c_custkey").cast("string")))
            % _GRID
        ).alias("y"),
    )
    cx = F.expr(f"x div {_RADIUS}")
    cy = F.expr(f"y div {_RADIUS}")
    probe = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.array(
                *[
                    F.struct((cx + dx).alias("cx"), (cy + dy).alias("cy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("a_key", "ax", "ay", "cell.cx", "cell.cy")
    build = cust.select(
        F.col("c_custkey").alias("b_key"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        probe.join(build, ["cx", "cy"])
        .filter((F.col("a_key") != F.col("b_key")) & (d2 <= _RADIUS * _RADIUS))
        .select("a_key", d2.alias("dist2"))
    )
    return pairs.groupBy(F.col("a_key").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.min("dist2").alias("min_dist2"),
    )


# --------------------------------------------------------------------------
# Skew-salted JOIN: replicate the dim, salt the fact.
# --------------------------------------------------------------------------
_SALTS = 8


@query(
    "skew_salted_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS hot_key,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), dim AS (
        SELECT DISTINCT hot_key, hot_key * 2 + 1 AS dim_attr FROM fact
    )
    SELECT f.hot_key, d.dim_attr,
           count(*) AS n_rows,
           round(sum(f.cents) / 100.0, 2) AS sum_value
    FROM fact f JOIN dim d USING (hot_key)
    GROUP BY f.hot_key, d.dim_attr
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-join under a manufactured hot key (~70% of rows on one
    key): the fact side salts each row (event_id % 8), the dim side
    replicates every row across all 8 salts, and the equi-join runs on
    (key, salt) — the hot key's rows spread over 8 tasks instead of one
    straggler. A SHUFFLE_HASH hint keeps the demo honest (the tiny dim
    would otherwise broadcast, which is of course the first-choice fix
    when the dim fits in memory). Results are exact-integer."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END").alias(
            "hot_key"
        ),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr(f"event_id % {_SALTS}").alias("salt"),
    )
    dim = (
        ev.select("hot_key")
        .distinct()
        .select(
            "hot_key",
            (F.col("hot_key") * 2 + 1).alias("dim_attr"),
            F.explode(
                F.array(*[F.lit(i) for i in range(_SALTS)])
            ).alias("salt"),
        )
    )
    joined = ev.join(dim.hint("shuffle_hash"), ["hot_key", "salt"])
    return joined.groupBy("hot_key", "dim_attr").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("cents") / 100.0, 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# As-of join with staleness tolerance: the TSDB variant where a match older
# than the tolerance window is no match at all (sensor joins, price lookups
# with max staleness). Same union + running-last composition as the
# unbounded as-of; the tolerance is a post-window predicate on the carried
# match timestamp.
# --------------------------------------------------------------------------
ASOF_TOL_US = 600 * 1_000_000  # 10-minute staleness cap


@query(
    "asof_join_tolerance",
    oracle=f"""
    SELECT c.event_id, c.user_id,
           (c.ts_us // 1000000) AS click_ts_s,
           CASE WHEN p.ts_us IS NOT NULL
                     AND c.ts_us - p.ts_us <= {ASOF_TOL_US}
                THEN round(p.mx_value, 2) END AS fresh_purchase_value,
           CAST(p.ts_us IS NOT NULL
                AND c.ts_us - p.ts_us <= {ASOF_TOL_US} AS INT) AS is_fresh
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS mx_value
                    FROM events WHERE event_type = 'purchase'
                    GROUP BY user_id, epoch_us(ts)) p
      ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 10-minute staleness cap: each click sees its
    user's most recent at-or-before purchase ONLY if that purchase is
    within the tolerance window — matches older than the cap are nulled
    (the ``ASOF ... TOLERANCE`` semantics of kdb/QuestDB/Pandas
    merge_asof). Composition: the unbounded as-of's union + running
    ``last(ignorenulls)`` carries the matched purchase TIMESTAMP
    alongside its value; the tolerance check is then a plain post-window
    predicate — still ONE shuffle on user_id, no inequality join
    anywhere."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("(ts - pmod(ts, 1000)) div 1000")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(None).cast("double").alias("mx_value"),
        F.lit(None).cast("long").alias("p_ts_us"),
        F.lit(1).alias("_src"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("mx_value"))
        .select(
            "user_id",
            "ts_us",
            F.lit(None).cast("long").alias("event_id"),
            "mx_value",
            F.col("ts_us").alias("p_ts_us"),
            F.lit(0).alias("_src"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fresh = F.col("_last_ts").isNotNull() & (
        (F.col("ts_us") - F.col("_last_ts")) <= ASOF_TOL_US
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("_last_val", F.last("mx_value", ignorenulls=True).over(w))
        .withColumn("_last_ts", F.last("p_ts_us", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
        .select(
            "event_id",
            "user_id",
            F.expr("ts_us div 1000000").alias("click_ts_s"),
            F.when(fresh, F.round("_last_val", 2)).alias("fresh_purchase_value"),
            fresh.cast("int").alias("is_fresh"),
        )
    )
