"""Extended analytics surface: join-on-aggregate shapes, exact quantiles,
and time-bucket gap-fill — rounding out SURVEY §2.3–§2.5 with the query
shapes a warehouse user expects beyond the reference's own pipeline
(reference has no quantiles/gap-fill; these are engine-surface extensions
like plans/joins_ext.py, cited there to SURVEY §2.3 "generic joins").

Scale notes (100 TB):
* q18: the HAVING-filtered aggregate runs FIRST (one shuffle on orderkey,
  map-side partial sums), and only surviving orderkeys join outward — the
  join input is the filtered aggregate, never raw lineitem.
* q10: selective filters (returnflag, 3-month window) reach the scans as
  PushedFilters; the 4-way join shuffles only filtered rows; top-k is
  TakeOrderedAndProject (no global sort shuffle).
* percentiles: exact percentile() needs per-group value collection — fine
  for bounded group counts (here: 3 flags). For unbounded groups at scale,
  use approx_percentile (t-digest, mergeable map-side) instead.
* gap-fill: the bucket grid is (time_range / width × n_keys) rows —
  independent of fact cardinality; generated with sequence+explode, never
  a driver loop. LOCF is one window pass partitioned by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import floor_bucket_s
from ..registry import query
from ..sources.parquet import load_table

_NS = 1_000_000_000


# --------------------------------------------------------------------------
# TPC-H Q18 shape: join against a HAVING-filtered aggregate.
# --------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(big.total_qty, 2) AS total_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: aggregate-then-join. The aggregate (with its
    HAVING filter) is the left input, so only qualifying orderkeys ever
    reach the orders/customer joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: selective multi-join + global top-k.
# --------------------------------------------------------------------------
@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter.
    Filters push to the scans; nation (25 rows) broadcasts; the final
    top-k is TakeOrderedAndProject, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # Sum in exact decimal and round BEFORE casting out: double
            # summation is order-dependent, and a half-way total like
            # x.595 flips by a cent if it passes through binary double
            # ahead of the round.
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Exact quantiles per group (percentile = linear interpolation, the same
# definition as DuckDB's quantile_cont / ANSI percentile_cont).
# --------------------------------------------------------------------------
@query(
    "percentile_agg",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS qs
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round(qs[1], 6) AS p25,
           round(qs[2], 6) AS p50,
           round(qs[3], 6) AS p75,
           round(qs[4], 6) AS p95
    FROM q
    """,
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Exact percentile() holds
    group values in memory — fine at bounded group count; unbounded-group
    jobs at scale should switch to approx_percentile (mergeable t-digest).
    One percentile aggregate serves all quantiles, then the array is
    projected to four scalar columns (scalar outputs keep the result
    hashable for any downstream row-wise comparer)."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.percentile(
        "l_extendedprice", F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.95)])
    )
    return (
        li.groupBy("l_returnflag")
        .agg(qs.alias("__qs"))
        .select(
            "l_returnflag",
            *[
                F.round(F.element_at("__qs", i + 1), 6).alias(name)
                for i, name in enumerate(("p25", "p50", "p75", "p95"))
            ],
        )
    )


# Scale-mode twin: the SAME quantile surface on the mergeable-sketch path.
_PCTL_QS = (0.25, 0.5, 0.75, 0.95)
_PCTL_EPS = 0.02  # rank-error budget; Spark accuracy=10000 => error 1e-4


def _pctl_approx_oracle() -> str:
    nq = len(_PCTL_QS)
    qs = ", ".join(str(q) for q in _PCTL_QS)
    # ONE exact array-percentile carries all 2x4 band edges (lo then hi):
    # separate lo/hi aggregates would each buffer the column again
    bands = ", ".join(
        [str(round(q - _PCTL_EPS, 2)) for q in _PCTL_QS]
        + [str(round(q + _PCTL_EPS, 2)) for q in _PCTL_QS]
    )
    flags = ", ".join(
        f"CAST(ap[{i + 1}] BETWEEN bd[{i + 1}] AND bd[{i + 1 + nq}] AS INT)"
        f" AS p{int(q * 100)}_ok"
        for i, q in enumerate(_PCTL_QS)
    )
    return f"""
    WITH g AS (
        SELECT l_returnflag,
               count(*) AS n_rows,
               approx_quantile(l_extendedprice, [{qs}]) AS ap,
               quantile_cont(l_extendedprice, [{bands}]) AS bd
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows, {flags} FROM g
    """


@query("percentile_agg_approx", oracle=_pctl_approx_oracle())
def percentile_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-mode twin of percentile_agg: the same four quantiles per
    group from approx_percentile — the mergeable-sketch aggregation whose
    per-group state is O(accuracy), not O(group), i.e. the plan actually
    run at 100x. Sketch values are engine-specific, so the cross-engine
    contract is the bounded-RANK-error assertion of
    approx_percentile_sketch: each engine's own approximate quantile must
    land between its own exact (q±2%) percentiles. The exact band
    aggregate here is the VALIDATION harness, not the operator — a
    production job ships only the sketch column."""
    li = load_table(spark, sf_dir, "lineitem")
    nq = len(_PCTL_QS)
    band_fracs = [round(q - _PCTL_EPS, 2) for q in _PCTL_QS] + [
        round(q + _PCTL_EPS, 2) for q in _PCTL_QS
    ]
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx(
            "l_extendedprice", F.array(*[F.lit(q) for q in _PCTL_QS]), 10000
        ).alias("__ap"),
        # one array aggregate for all band edges: a single per-group buffer
        F.percentile(
            "l_extendedprice", F.array(*[F.lit(q) for q in band_fracs])
        ).alias("__bd"),
    )
    return g.select(
        "l_returnflag",
        "n_rows",
        *[
            F.element_at("__ap", i + 1)
            .between(
                F.element_at("__bd", i + 1), F.element_at("__bd", i + 1 + nq)
            )
            .cast("int")
            .alias(f"p{int(q * 100)}_ok")
            for i, q in enumerate(_PCTL_QS)
        ],
    )


# --------------------------------------------------------------------------
# Time-bucket rollup with gap-fill + LOCF (the hypertable-rollup shape).
# --------------------------------------------------------------------------
@query(
    "gapfill_locf",
    oracle="""
    WITH actual AS (
        SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS bucket_s,
               event_type,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT min(bucket_s) AS lo, max(bucket_s) AS hi FROM actual
    ), grid AS (
        SELECT gs.g AS bucket_s, t.event_type
        FROM (SELECT unnest(generate_series(lo, hi, 900)) AS g FROM bounds) gs
        CROSS JOIN (SELECT DISTINCT event_type FROM actual) t
    )
    SELECT g.bucket_s, g.event_type,
           a2.sum_value AS filled_value,
           CAST(a.bucket_s IS NULL AS INT) AS is_gap
    FROM grid g
    LEFT JOIN actual a
      ON a.event_type = g.event_type AND a.bucket_s = g.bucket_s
    ASOF LEFT JOIN actual a2
      ON a2.event_type = g.event_type AND a2.bucket_s <= g.bucket_s
    """,
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-min rollup per event_type over a dense bucket grid; empty buckets
    carry the last observed value forward (LOCF).

    The grid is sequence(min,max) × distinct keys — its size depends on the
    time range, not the fact table, so the cross join is a broadcast of two
    tiny relations even at 100 TB. LOCF is last(ignorenulls) over one
    window partitioned by key; equivalent to the oracle's per-key ASOF."""
    ev = load_table(spark, sf_dir, "events")
    actual = (
        ev.withColumn("bucket_s", floor_bucket_s("ts", 900))
        .groupBy("bucket_s", "event_type")
        .agg(F.round(F.sum("value"), 2).alias("sum_value"))
    )
    bounds = actual.agg(
        F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi")
    )
    grid = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.lit(900))).alias("bucket_s")
        )
        .crossJoin(F.broadcast(actual.select("event_type").distinct()))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(actual, ["bucket_s", "event_type"], "left")
        .select(
            "bucket_s",
            "event_type",
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("sum_value").isNull().cast("int").alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
# CDC apply / merge-upsert: last-write-wins by key over base ∪ changes.
# The changes batch here is derived deterministically from orders itself
# (every 10th key updated, a shifted key range inserted) so the oracle sees
# the identical input without any side files.
# --------------------------------------------------------------------------
@query(
    "cdc_upsert_apply",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice,
               0 AS _v
        FROM orders
    ), changes AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               round(o_totalprice, 2) + 1000 AS o_totalprice, 1 AS _v
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000, 'N', round(o_totalprice, 2), 1
        FROM orders WHERE o_orderkey % 1000 = 7
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY _v DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
    ) WHERE rn = 1
    """,
)
def cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-upsert without a table format: base ∪ changes, keep the
    highest-version row per key (row_number over a per-key window).

    At scale this is the standard CDC-apply compaction: one shuffle on the
    merge key; with the base stored bucketed by key the shuffle drops to
    the (small) changes side only. Table formats (Delta/Iceberg MERGE) do
    the same thing with transactional bookkeeping on top."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("_v"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            # +1000 after the round: an exact IEEE op on both engines —
            # a multiplicative bump (*1.1) makes systematic x.xx5 half-way
            # values that HALF_UP (Spark) and C round (DuckDB) split on.
            (F.round("o_totalprice", 2) + 1000).alias("o_totalprice"),
            F.lit(1).alias("_v"),
        )
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 1000 == 7)
        .select(
            (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.lit(1).alias("_v"),
        )
    )
    merged = base.unionByName(updates).unionByName(inserts)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("_v").desc())
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: join + per-group conditional counts (CASE inside SUM).
# --------------------------------------------------------------------------
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts per group after a fact-fact join: CASE folds the
    priority split into ONE pass/shuffle — never two filtered scans."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape: global scalar ratio of a conditional sum (promo share).
# --------------------------------------------------------------------------
@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                        AS DECIMAL(18,6))
                              ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE),
             6) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share for one month: conditional and total revenue in
    the SAME single-pass global aggregate (decimal sums — exact, order-
    independent); part joins broadcast when it fits, shuffles when not
    (left to AQE — part is not always broadcastable at real scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


# --------------------------------------------------------------------------
# SCD2 history construction: change log → validity intervals.
# --------------------------------------------------------------------------
@query(
    "scd2_intervals",
    oracle="""
    SELECT user_id,
           event_type AS attr_value,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT) AS valid_to_s,
           CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
    FROM events
    WHERE user_id <= 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each event sets the user's
    current attribute; validity runs until the next change (lead), open
    interval = current row. The standard change-log → history-table
    compaction, as ONE window pass partitioned by the entity key (high
    cardinality → even spread; no self-join, no sort beyond the per-key
    window order). Tie-broken by event_id so the interval chain is a
    total order on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("attr_value"),
        floor_bucket_s("ts", 1).alias("valid_from_s"),
        nxt.alias("__next_ts"),
    ).select(
        "user_id",
        "attr_value",
        "valid_from_s",
        floor_bucket_s("__next_ts", 1).alias("valid_to_s"),
        F.col("__next_ts").isNull().cast("int").alias("is_current"),
    )


# --------------------------------------------------------------------------
# Funnel conversion: ordered event-pair matching within a time window.
# --------------------------------------------------------------------------
@query(
    "funnel_conversion",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type,
               max(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_click_ts
        FROM events
    ), purchases AS (
        SELECT user_id,
               CASE WHEN last_click_ts IS NOT NULL
                         AND epoch(ts) - epoch(last_click_ts) <= 3600
                    THEN 1 ELSE 0 END AS converted,
               CASE WHEN last_click_ts IS NOT NULL
                         AND epoch(ts) - epoch(last_click_ts) <= 3600
                    THEN CAST(floor(epoch(ts)) AS BIGINT) END AS conv_ts_s
        FROM seq WHERE event_type = 'purchase'
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           min(conv_ts_s) AS first_conversion_s
    FROM purchases GROUP BY user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click → purchase funnel within 1 hour, per user: a purchase converts
    when the most recent preceding click is ≤ 3600 s older.

    The 'most recent preceding A' is a running MAX over the per-user event
    sequence — one window pass, no clicks×purchases join (the naive pair
    join is quadratic in per-user activity; the running max is linear and
    partition-local after one shuffle on user_id). Timestamps are int64
    nanos, so the window math is pure integer arithmetic. Tie rule: at an
    identical timestamp, (ts, event_id) sequence order decides whether
    the click precedes the purchase — identical on both engines (the
    oracle windows over the same keys)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    seq = ev.select(
        "user_id", "ts", "event_type", last_click.alias("last_click_ts")
    ).filter(F.col("event_type") == "purchase")
    converted = (
        F.col("last_click_ts").isNotNull()
        & ((F.col("ts") - F.col("last_click_ts")) <= 3600 * _NS)
    )
    purchases = seq.select(
        "user_id",
        converted.cast("int").alias("converted"),
        F.when(converted, floor_bucket_s("ts", 1)).alias("conv_ts_s"),
    )
    return purchases.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.min("conv_ts_s").alias("first_conversion_s"),
    )


# --------------------------------------------------------------------------
# Approximate percentiles — the unbounded-group companion to percentile_agg.
# --------------------------------------------------------------------------
@query(
    "approx_percentile_sketch",
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               count(*) AS n_rows,
               approx_quantile(l_extendedprice, 0.5) AS ap,
               quantile_cont(l_extendedprice, 0.48) AS lo,
               quantile_cont(l_extendedprice, 0.52) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           CAST(ap BETWEEN lo AND hi AS INT) AS within_2pct_rank
    FROM g
    """,
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable sketch — the scale path named in
    percentile_agg): like the HLL check, the sketch value is
    engine-specific, so the contract both engines agree on exactly is a
    bounded-RANK-error assertion — each engine's own approximate median
    must land between its exact 48th and 52nd percentiles. Output:
    (group, n_rows, 1). Spark's accuracy=10000 bounds rank error at
    n/10000 ≪ 2% of n; DuckDB's t-digest is far inside 2% rank error at
    these group sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("__ap"),
            F.percentile("l_extendedprice", F.lit(0.48)).alias("__lo"),
            F.percentile("l_extendedprice", F.lit(0.52)).alias("__hi"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            F.col("__ap")
            .between(F.col("__lo"), F.col("__hi"))
            .cast("int")
            .alias("within_2pct_rank"),
        )
    )



# --------------------------------------------------------------------------
# Shared part co-occurrence graph: ONE edge definition (and one oracle CTE)
# for triangle counting, degree distribution, and label propagation — a
# change to the cap or the build cannot silently diverge the three.
# --------------------------------------------------------------------------
_PART_EDGE_CAP = 300

_SQL_PART_EDGES = f"""picked AS (
        SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey <= {_PART_EDGE_CAP}
    ), edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM picked a JOIN picked b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )"""


def _part_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct u<v part co-occurrence edges (per-order self-join bounded
    by order width; the cap keeps the demo graph small)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= _PART_EDGE_CAP
    )
    picked = li.select("l_orderkey", "l_partkey")
    a = picked.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = picked.select("l_orderkey", F.col("l_partkey").alias("v"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


# --------------------------------------------------------------------------
# Graph analytics: triangle counting (the two-join wedge-close pattern).
# --------------------------------------------------------------------------
@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_SQL_PART_EDGES}, wedges AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1 JOIN edges e2 ON e1.v = e2.u
    )
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM edges) AS n_edges
    FROM wedges w
    JOIN edges e3 ON e3.u = w.a AND e3.v = w.c
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-occurrence graph of (bounded) parts that
    appear in the same order — the canonical distributed graph-analytics
    shape beyond connected components.

    Orientation trick: edges are stored ONCE as u < v, wedges extend
    a < b < c, and the closing join checks (a, c) — each triangle is
    counted exactly once with no post-hoc division, and the wedge
    population (Σ deg²) is generated only from the oriented half of the
    adjacency, the standard way to keep the intermediate bounded on
    skewed degree distributions. Two shuffle joins on int keys; the edge
    build itself is a per-order self-join bounded by order width."""
    edges = _part_cooccurrence_edges(spark, sf_dir).persist()
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "c")
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = wedges.join(e3, ["a", "c"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.crossJoin(F.broadcast(n_edges))


# --------------------------------------------------------------------------
# Sequence mining lite: event-type transition counts.
# --------------------------------------------------------------------------
@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    )
    SELECT src, dst, count(*) AS n
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences (the
    markov/funnel-exploration primitive): one lead() window pass per user
    plus a tiny (|types|²) aggregation. Tie-broken by event_id — a total
    sequence order on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Data-quality rule evaluation: the dbt-test / expectations shape.
# --------------------------------------------------------------------------
@query(
    "dq_lineitem_rules",
    oracle="""
    WITH scan AS (
        SELECT count(*) AS n_rows,
               sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS null_pk,
               sum(CASE WHEN l_quantity < 0 OR l_quantity > 100
                        THEN 1 ELSE 0 END) AS qty_out_of_range,
               sum(CASE WHEN l_discount < 0 OR l_discount > 1
                        THEN 1 ELSE 0 END) AS bad_discount,
               sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_shipdate
        FROM lineitem
    ), orphans AS (
        SELECT count(*) AS orphan_lines
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    )
    -- CAST AS BIGINT: sum() over integers is HUGEINT in DuckDB, which the
    -- driver's pandas-side hash renders as float64 while Spark emits bigint
    -- (values identical, hash diverges). Pin the oracle to BIGINT.
    SELECT r.rule, CAST(r.n_violations AS BIGINT) AS n_violations, s.n_rows
    FROM scan s, orphans o,
         LATERAL (VALUES ('null_pk', s.null_pk),
                         ('qty_out_of_range', s.qty_out_of_range),
                         ('bad_discount', s.bad_discount),
                         ('null_shipdate', s.null_shipdate),
                         ('orphan_lines', o.orphan_lines)) AS r(rule, n_violations)
    """,
)
def dq_lineitem_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule evaluation, one row per rule: all row-local rules
    (null pk, range checks) fold into a SINGLE scan of conditional
    aggregates; the one cross-table rule (orphaned fact rows) is an anti
    join counted separately. At 100 TB this is the shape that matters —
    N rules ≠ N scans; adding a row-local rule costs one more aggregate
    expression in the same pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    scan = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias("null_pk"),
        F.sum(
            ((F.col("l_quantity") < 0) | (F.col("l_quantity") > 100)).cast("long")
        ).alias("qty_out_of_range"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("bad_discount"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_shipdate"),
    )
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lines"))
    )
    wide = scan.crossJoin(F.broadcast(orphans))
    rules = ["null_pk", "qty_out_of_range", "bad_discount", "null_shipdate",
             "orphan_lines"]
    stacked = wide.selectExpr(
        "n_rows",
        "stack({n}, {pairs}) AS (rule, n_violations)".format(
            n=len(rules), pairs=", ".join(f"'{r}', {r}" for r in rules)
        ),
    )
    return stacked.select("rule", "n_violations", "n_rows")


# --------------------------------------------------------------------------
# Pareto coverage: smallest prefix of docs covering half the corpus bytes.
# --------------------------------------------------------------------------
@query(
    "pareto_topshare",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               sum(n_chars) OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_chars,
               sum(n_chars) OVER (PARTITION BY source) AS total_chars
        FROM documents
    )
    -- CAST AS BIGINT: the windowed sums are HUGEINT in DuckDB (pandas renders
    -- float64, Spark bigint; driver hash diverges on type, not value).
    SELECT source,
           count(*) AS n_docs_half,
           CAST(max(cum_chars) AS BIGINT) AS chars_covered,
           CAST(max(total_chars) AS BIGINT) AS total_chars
    FROM ranked
    WHERE 2 * (cum_chars - n_chars) < total_chars
    GROUP BY source
    """,
)
def pareto_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How few (largest) documents cover >=50% of each source's bytes — the
    corpus-concentration profile a sampling plan starts from. Pure integer
    window math (a row is kept while coverage BEFORE it is under half), so
    the cut point is exact. One shuffle on source; the running sum is a
    rows-frame window in that same partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w_cum).alias("cum_chars"),
        F.sum("n_chars").over(w_all).alias("total_chars"),
    )
    return (
        ranked.filter(
            2 * (F.col("cum_chars") - F.col("n_chars")) < F.col("total_chars")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_half"),
            F.max("cum_chars").alias("chars_covered"),
            F.max("total_chars").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Z-order bucketing: bit-interleaved multi-column clustering key.
# --------------------------------------------------------------------------
_Z_BITS = 10


def _z_interleave_spark(px: str, sx: str) -> str:
    """Spark SQL text for the 2x10-bit Morton interleave of two columns."""
    return " + ".join(
        f"shiftleft(shiftright({px}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({sx}, {i}) & 1, {2 * i + 1})"
        for i in range(_Z_BITS)
    )


def _z_interleave_duck(px: str, sx: str) -> str:
    """Same interleave in DuckDB operator syntax — generated from the same
    bit positions, so the two texts are equivalent by construction."""
    return " + ".join(
        f"((({px} >> {i}) & 1) << {2 * i})"
        f" + ((({sx} >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )


@query(
    "zorder_bucket",
    oracle=f"""
    WITH keyed AS (
        SELECT (l_partkey % 1024) AS px, (l_suppkey % 1024) AS sx
        FROM lineitem
    ), z AS (
        SELECT {_z_interleave_duck("px", "sx")} AS zval FROM keyed
    )
    SELECT zval // 4096 AS z_bucket,
           count(*) AS n_rows,
           min(zval) AS z_min,
           max(zval) AS z_max
    FROM z
    GROUP BY 1
    """,
)
def zorder_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key over (partkey, suppkey) mod 1024 — the
    clustering transform behind multi-dimensional data skipping: writing
    files sorted by zval gives BOTH per-column min/max locality, so scans
    filtered on either key prune files. Pure integer bit math (exact on
    any engine); the layout op itself is scan-stage, and the bucket
    histogram here is one tiny-key shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("l_partkey % 1024").alias("px"),
        F.expr("l_suppkey % 1024").alias("sx"),
    )
    z = li.select(F.expr(_z_interleave_spark("px", "sx")).alias("zval"))
    return (
        z.groupBy(F.expr("zval div 4096").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


# --------------------------------------------------------------------------
# Skyline (Pareto-dominance) query: cheapest-yet-largest parts.
# --------------------------------------------------------------------------
@query(
    "skyline_dominance",
    oracle="""
    WITH ranked AS (
        SELECT p_partkey, p_retailprice, p_size,
               max(p_size) OVER (
                   ORDER BY p_retailprice ASC, p_size DESC, p_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_max_size
        FROM part
    )
    SELECT p_partkey, p_retailprice, p_size
    FROM ranked
    WHERE prev_max_size IS NULL OR p_size > prev_max_size
    """,
)
def skyline_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline over (minimize price, maximize size): parts no other part
    beats on both axes (equal pairs keep the lowest partkey). Computed the
    divide-and-conquer way — a LOCAL skyline per hash bucket (parallel
    window, removes ~all rows) and a global pass over the few survivors —
    because skyline(union of local skylines) = skyline. The oracle is the
    single-pass global form of the same running-max rule; the two are
    provably equivalent, and only the reduced set ever hits the global
    sort."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )

    def keep(df: DataFrame, w: Window) -> DataFrame:
        flt = df.withColumn(
            "__pm",
            F.max("p_size").over(
                w.orderBy(
                    F.col("p_retailprice").asc(),
                    F.col("p_size").desc(),
                    F.col("p_partkey").asc(),
                ).rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        return flt.filter(
            F.col("__pm").isNull() | (F.col("p_size") > F.col("__pm"))
        ).drop("__pm")

    local = keep(
        part.withColumn("__b", F.expr("p_partkey % 32")),
        Window.partitionBy("__b"),
    ).drop("__b")
    return keep(local, Window.partitionBy())


# --------------------------------------------------------------------------
# Incremental aggregate maintenance: merge partial states, don't recompute.
# --------------------------------------------------------------------------
_INCR_SPLIT_S = 1_200_000_000  # base/delta boundary (epoch seconds)


@query(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
               AS sum_value,
           CAST(max(floor(epoch(ts))) AS BIGINT) AS last_seen_s
    FROM events
    GROUP BY event_type
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance: the BASE partition's partial
    states (count / exact-cents sum / max) are computed once, the DELTA
    partition's states separately, and the result MERGES states instead of
    re-aggregating raw base rows — count+count, sum+sum, max(max). The
    oracle aggregates everything directly, proving state merge == full
    recompute. At 100 TB this is the difference between touching one day
    of data and touching the whole table; every aggregate this engine
    ships in incremental pipelines is chosen mergeable (sum/count/min/max,
    and approx sketches are mergeable too)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        floor_bucket_s("ts", 1).alias("ts_s"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.max("ts_s").alias("last_seen_s"),
        )

    base = partial(ev.filter(F.col("ts_s") < _INCR_SPLIT_S))
    delta = partial(ev.filter(F.col("ts_s") >= _INCR_SPLIT_S))
    merged = base.unionByName(delta)
    return merged.groupBy("event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_cents") / 100.0, 2).alias("sum_value"),
        F.max("last_seen_s").alias("last_seen_s"),
    )


# --------------------------------------------------------------------------
# Recursive-CTE hierarchy walk (Spark 4 WITH RECURSIVE).
# --------------------------------------------------------------------------
@query(
    "hierarchy_rollup_recursive",
    oracle="""
    WITH RECURSIVE c AS (
        SELECT c_custkey AS k, c_custkey // 10 AS parent,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ), walk AS (
        SELECT k, k AS root_key, 0 AS depth, cents AS chain_cents
        FROM c WHERE parent = 0
        UNION ALL
        SELECT c.k, w.root_key, w.depth + 1, w.chain_cents + c.cents
        FROM c JOIN walk w ON w.k = c.parent AND c.k >= 10
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT root_key) AS BIGINT) AS n_roots,
           CAST(sum(chain_cents) AS BIGINT) AS sum_chain_cents
    FROM walk GROUP BY depth
    """,
)
def hierarchy_rollup_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk via Spark 4's WITH RECURSIVE — the SQL surface
    every BOM / org-chart / account-tree workload needs and that
    previously forced hand-unrolled iteration (graph_bfs_distance's
    shape). The customer table becomes a deterministic forest
    (parent = custkey / 10, roots at custkey ≤ 9 — custkey 0 maps to
    itself, so the descent is restricted to children ≥ 10, which also
    makes the forest definition self-loop-free); the recursion
    carries each node's depth, root, and the exact cents sum along its
    ancestor chain, then a per-depth rollup summarizes the forest. The
    DuckDB oracle runs the IDENTICAL recursive CTE — both engines
    execute real recursion, not an unrolled imitation.

    Exactness: every node has exactly one parent, so each row is
    derived once; depth/cents are pure integer arithmetic — engines
    cannot diverge.

    Plan: each recursion level is one join of the frontier against the
    child table keyed on parent — at 100 TB this is log-depth rounds of
    key-equi joins (the same shape the hand-rolled BFS uses), with the
    frontier shrinking geometrically for a balanced hierarchy; Spark
    executes the loop natively under AQE."""
    cust = load_table(spark, sf_dir, "customer")
    cust.select(
        F.col("c_custkey").alias("k"),
        F.expr("c_custkey DIV 10").alias("parent"),
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)").alias("cents"),
    ).createOrReplaceTempView("__hier_customer")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT k, k AS root_key, 0 AS depth, cents AS chain_cents
            FROM __hier_customer WHERE parent = 0
            UNION ALL
            SELECT c.k, w.root_key, w.depth + 1, w.chain_cents + c.cents
            FROM __hier_customer c JOIN walk w ON w.k = c.parent
                                              AND c.k >= 10
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT root_key) AS BIGINT) AS n_roots,
               CAST(sum(chain_cents) AS BIGINT) AS sum_chain_cents
        FROM walk GROUP BY depth
        """
    )


# --------------------------------------------------------------------------
# Incremental JOIN maintenance: the four-term delta identity.
# --------------------------------------------------------------------------
@query(
    "incremental_join_delta",
    oracle="""
    WITH o_old AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 10 <> 0
    ), o_new AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0
    ), l_old AS (
        SELECT l_orderkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_linenumber % 4 <> 0
    ), l_new AS (
        SELECT l_orderkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_linenumber % 4 = 0
    ), terms AS (
        SELECT 'full' AS term, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(coalesce(sum(l.cents), 0) AS BIGINT) AS cents
        FROM orders o
        JOIN (SELECT l_orderkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem) l
          ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'old_old', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(l.cents), 0) AS BIGINT)
        FROM o_old o JOIN l_old l ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'delta_old', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(l.cents), 0) AS BIGINT)
        FROM o_new o JOIN l_old l ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'old_delta', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(l.cents), 0) AS BIGINT)
        FROM o_old o JOIN l_new l ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'delta_delta', CAST(count(*) AS BIGINT),
               CAST(coalesce(sum(l.cents), 0) AS BIGINT)
        FROM o_new o JOIN l_new l ON l.l_orderkey = o.o_orderkey
    )
    SELECT term, n_rows, cents FROM terms
    UNION ALL
    SELECT 'reconstructed',
           CAST(sum(n_rows) AS BIGINT), CAST(sum(cents) AS BIGINT)
    FROM terms WHERE term <> 'full'
    """,
)
def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for JOINs, certified by the delta
    identity: with A = A_old ∪ ΔA and B = B_old ∪ ΔB (disjoint
    hash-derived splits of orders and lineitem),
    A⋈B = (A_old⋈B_old) ∪ (ΔA⋈B_old) ∪ (A_old⋈ΔB) ∪ (ΔA⋈ΔB). The
    'reconstructed' row sums the four delta terms and must equal the
    'full' row in both row count and exact revenue cents — the algebra
    every incremental pipeline (CDC join views, streaming joins,
    lakehouse MERGE) silently relies on, here made into a checked,
    regression-testable surface next to incremental_agg_merge's
    aggregate leg. At 100 TB the point is the three delta terms touch
    |Δ|-proportional data; only the certification run pays the full
    join.

    Exactness: all six rows are integer counts + exact integer cents —
    no floats anywhere.

    Plan: four key-equi joins (the same shuffle key, so co-partitioning
    is reused) plus the full join; 1-row aggregates union into the
    6-row report. Property: full == reconstructed, asserted both by the
    oracle comparison and a dedicated test."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    o_old = orders.filter(F.expr("o_orderkey % 10 <> 0"))
    o_new = orders.filter(F.expr("o_orderkey % 10 = 0"))
    l_old = li.filter(F.expr("l_linenumber % 4 <> 0"))
    l_new = li.filter(F.expr("l_linenumber % 4 = 0"))

    def term(name: str, o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0))
                .cast("long")
                .alias("cents"),
            )
            .select(F.lit(name).alias("term"), "n_rows", "cents")
        )

    deltas = (
        term("old_old", o_old, l_old)
        .unionByName(term("delta_old", o_new, l_old))
        .unionByName(term("old_delta", o_old, l_new))
        .unionByName(term("delta_delta", o_new, l_new))
    )
    full = term("full", orders, li)
    recon = deltas.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("cents"),
    ).select(F.lit("reconstructed").alias("term"), "n_rows", "cents")
    return full.unionByName(deltas).unionByName(recon)


# --------------------------------------------------------------------------
# Snapshot diff / reconciliation: added, removed, changed per key.
# --------------------------------------------------------------------------
@query(
    "table_snapshot_diff",
    oracle="""
    WITH v1 AS (
        SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 7 <> 0
    ), v2 AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT)
                   + (CASE WHEN event_id % 3 = 0 THEN 100 ELSE 0 END) AS cents
        FROM events WHERE event_id % 5 <> 0
    )
    -- CAST AS BIGINT on every counter: DuckDB sum(int) is HUGEINT → pandas
    -- float64, while Spark emits bigint; the driver hash diverges on type.
    SELECT coalesce(v1.event_type, v2.event_type) AS event_type,
           CAST(sum(CASE WHEN v1.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN v2.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN v1.event_id IS NOT NULL AND v2.event_id IS NOT NULL
                         AND v1.cents <> v2.cents THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN v1.event_id IS NOT NULL AND v2.event_id IS NOT NULL
                         AND v1.cents = v2.cents THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM v1 FULL OUTER JOIN v2 USING (event_id)
    GROUP BY 1
    """,
)
def table_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two table snapshots (the audit step after a migration or
    CDC replay): FULL OUTER JOIN on the key classifies every row as
    added / removed / changed / unchanged, then rolls up per type. The two
    snapshots here are deterministic filtered/mutated views of events. At
    scale the join keys co-partition (same key, same hash), so AQE plans
    one co-located shuffle join; with bucketed tables it would be
    shuffle-free."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    v1 = ev.filter(F.expr("event_id % 7 <> 0")).select(
        F.col("event_id"), F.col("event_type").alias("t1"), F.col("cents").alias("c1")
    )
    v2 = ev.filter(F.expr("event_id % 5 <> 0")).select(
        F.col("event_id"),
        F.col("event_type").alias("t2"),
        (F.col("cents") + F.expr("CASE WHEN event_id % 3 = 0 THEN 100 ELSE 0 END")).alias("c2"),
    )
    j = v1.join(v2, "event_id", "full_outer")
    return (
        j.groupBy(F.coalesce("t1", "t2").alias("event_type"))
        .agg(
            F.sum(F.expr("CASE WHEN t1 IS NULL THEN 1 ELSE 0 END")).alias("n_added"),
            F.sum(F.expr("CASE WHEN t2 IS NULL THEN 1 ELSE 0 END")).alias("n_removed"),
            F.sum(
                F.expr(
                    "CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND c1 <> c2"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("n_changed"),
            F.sum(
                F.expr(
                    "CASE WHEN t1 IS NOT NULL AND t2 IS NOT NULL AND c1 = c2"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("n_unchanged"),
        )
    )


# --------------------------------------------------------------------------
# Three-step strict-order funnel: view → click → purchase, each within an
# hour of the previous step — chained running-max windows, still linear.
# --------------------------------------------------------------------------
@query(
    "funnel_three_step",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               max(CASE WHEN event_type = 'view' THEN ts END)
                   OVER w AS last_view_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ), q AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'click' AND last_view_ts IS NOT NULL
                         AND epoch(ts) - epoch(last_view_ts) <= 3600
                    THEN ts END AS qclick_ts
        FROM seq
    ), seq2 AS (
        SELECT user_id, ts, event_type,
               max(qclick_ts) OVER w AS last_qclick_ts
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN last_qclick_ts IS NOT NULL
                              AND epoch(ts) - epoch(last_qclick_ts) <= 3600
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel_conversions
    FROM seq2
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order 3-step funnel (view → click → purchase, each step ≤ 1 h
    after the previous): the 'qualified predecessor' running MAX chains —
    a click is qualified only if a view precedes it in time, and a
    purchase converts only off a qualified click — so an N-step funnel
    stays ONE window pass per step over the SAME (user_id, ts, event_id)
    partitioning: one shuffle total, never a step-wise self-join (the
    naive form is product-of-step-counts per user). Timestamps are int64
    nanos; window math is pure integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    hour_ns = 3600 * 1_000_000_000
    seq = ev.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    q = seq.withColumn(
        "qclick_ts",
        F.when(
            (F.col("event_type") == "click")
            & F.col("last_view_ts").isNotNull()
            & ((F.col("ts") - F.col("last_view_ts")) <= hour_ns),
            F.col("ts"),
        ),
    )
    seq2 = q.withColumn("last_qclick_ts", F.max("qclick_ts").over(w))
    return (
        seq2.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("last_qclick_ts").isNotNull()
                    & ((F.col("ts") - F.col("last_qclick_ts")) <= hour_ns),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_funnel_conversions"),
        )
    )


# --------------------------------------------------------------------------
# Degree distribution over the same co-occurrence graph: the first profile
# anyone pulls before running heavier graph algorithms on a new edge set.
# --------------------------------------------------------------------------
@query(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_SQL_PART_EDGES}, deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) GROUP BY node
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           count(*) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node
    FROM deg
    GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the part co-occurrence graph (same oriented
    u<v edge build as graph_triangle_count, un-oriented for degrees by
    unioning both endpoints): per degree, how many nodes — the skew
    profile that decides whether the heavier algorithms (triangles, CC,
    PageRank) need salting before they run. Two count aggregations over
    the edge list; the edge build dominates and is shared logic with the
    triangle counter."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    nodes = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(F.col("degree").cast("long").alias("degree"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").cast("long").alias("min_node"),
        )
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time lookup: "what was every entity's attribute at time T"
# over the registered history table — the read side of slowly-changing
# dimensions.
# --------------------------------------------------------------------------
def _scd2_as_of_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH hist AS MATERIALIZED ({ORACLES['scd2_intervals']}),
    t AS (
        SELECT (min(valid_from_s) + max(valid_from_s)) // 2 AS as_of_s
        FROM hist
    )
    SELECT h.user_id,
           h.attr_value,
           h.valid_from_s,
           CAST(t.as_of_s AS BIGINT) AS as_of_s
    FROM hist h, t
    WHERE h.valid_from_s <= t.as_of_s
      AND (h.valid_to_s IS NULL OR h.valid_to_s > t.as_of_s)
    """


@query("scd2_as_of", oracle=_scd2_as_of_oracle())
def scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: the version of every entity valid
    at T, read from the REGISTERED scd2_intervals history (both engine
    and oracle compose it, so the lookup can never disagree with the
    build). T is derived deterministically from the data (the midpoint
    of observed interval starts, pure integer math) so the query
    survives fixture regeneration. Interval chains are contiguous and
    tie-broken, so ``from <= T < to`` (open interval = current) matches
    at most one version per entity. Plan: the history scan filtered by
    two scalar comparisons against a broadcast 1-row bound — at scale
    this is the partition-pruned read path of any bitemporal table."""
    from ..registry import QUERIES

    hist = QUERIES["scd2_intervals"](spark, sf_dir)
    # integer div: matches DuckDB's // exactly (double division + truncation
    # would agree only while epochs stay positive)
    t = hist.agg(
        F.expr("(min(valid_from_s) + max(valid_from_s)) div 2").alias("as_of_s")
    )
    return (
        hist.crossJoin(F.broadcast(t))
        .filter(
            (F.col("valid_from_s") <= F.col("as_of_s"))
            & (F.col("valid_to_s").isNull() | (F.col("valid_to_s") > F.col("as_of_s")))
        )
        .select("user_id", "attr_value", "valid_from_s", "as_of_s")
    )


# --------------------------------------------------------------------------
# Graph analytics: synchronized label propagation (community detection),
# unrolled to a fixed iteration count with a deterministic tie-break.
# --------------------------------------------------------------------------
_LPA_ITERS = 2
_LPA_SEED_MOD = 4


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH {_SQL_PART_EDGES}, nbr AS (
        SELECT u AS node, v AS nb FROM edges
        UNION ALL
        SELECT v AS node, u AS nb FROM edges
    ), l0 AS (
        SELECT DISTINCT node, node % {_LPA_SEED_MOD} AS lbl FROM nbr
    ), votes1 AS (
        SELECT n.node, l.lbl, count(*) AS c
        FROM nbr n JOIN l0 l ON l.node = n.nb
        GROUP BY n.node, l.lbl
    ), mx1 AS (
        SELECT node, lbl, c, max(c) OVER (PARTITION BY node) AS m FROM votes1
    ), l1 AS (
        SELECT node, min(lbl) AS lbl FROM mx1 WHERE c = m GROUP BY node
    ), votes2 AS (
        SELECT n.node, l.lbl, count(*) AS c
        FROM nbr n JOIN l1 l ON l.node = n.nb
        GROUP BY n.node, l.lbl
    ), mx2 AS (
        SELECT node, lbl, c, max(c) OVER (PARTITION BY node) AS m FROM votes2
    ), l2 AS (
        SELECT node, min(lbl) AS lbl FROM mx2 WHERE c = m GROUP BY node
    )
    SELECT node, lbl AS label FROM l2
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronized label propagation on the part co-occurrence graph
    (same edge set as graph_triangle_count): every node adopts the most
    frequent label among its neighbors each round, ties broken toward
    the SMALLEST label — the (max-count, min-label) rule both engines
    evaluate identically, unlike max_by/arg_max whose tie order is
    engine-defined. Fixed 2 synchronized rounds, seed label node % 4
    (_LPA_ITERS / _LPA_SEED_MOD).

    Plan shape per round: one join of the neighbor list against the
    label table (both keyed on node ids), a (node, lbl) vote count, a
    node-partitioned max window, and a node rollup — every shuffle keys
    on node ids, so a power-law degree skew lands where AQE skew
    handling and map-side partials absorb it. The neighbor list is
    iteration-invariant: at scale, persist it once (the kcore pattern,
    graph_kcore_peel) instead of recomputing; here the unrolled plan
    lets Spark's exchange reuse dedupe the identical edge subtrees."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    nbr = edges.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    labels = nbr.select(
        "node", (F.col("node") % _LPA_SEED_MOD).alias("lbl")
    ).distinct()
    for _ in range(_LPA_ITERS):
        votes = (
            nbr.join(
                labels.select(F.col("node").alias("nb"), "lbl"), "nb"
            )
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        mx = votes.withColumn("m", F.max("c").over(Window.partitionBy("node")))
        labels = (
            mx.filter(F.col("c") == F.col("m"))
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
    return labels.select("node", F.col("lbl").alias("label"))



# --------------------------------------------------------------------------
# Order cycle time: orderdate -> last shipment duration percentiles per
# priority band (the ops-latency SLA table).
# --------------------------------------------------------------------------
@query(
    "cycle_time_percentiles",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(max(l.l_shipdate) AS DATE)) AS cycle_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           quantile_cont(cycle_days, 0.50) AS p50_days,
           quantile_cont(cycle_days, 0.90) AS p90_days,
           max(cycle_days) AS max_days
    FROM spans
    GROUP BY o_orderpriority
    """,
)
def cycle_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fulfillment cycle time (order date to last line shipment) in
    integer days, with exact p50/p90 per priority band. Integer-day
    inputs keep the interpolated percentiles on exact multiples of
    1/100 day — identical on both engines (the cents discipline of
    mad_robust_outliers applied to dates; date_diff over CAST-to-date
    works for both TIMESTAMP and TIMESTAMP_NTZ fixture generations).

    Plan shape: one l_orderkey aggregation (max shipdate) joined to
    orders on the same key, then a 5-group exact-percentile aggregate —
    each group holds order-grain durations; for unbounded bands swap
    approx_percentile (percentile_agg contract)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__last_ship"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("__last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("cycle_days"),
        )
    )
    return spans.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("cycle_days", F.lit(0.50)).alias("p50_days"),
        F.percentile("cycle_days", F.lit(0.90)).alias("p90_days"),
        F.max("cycle_days").cast("long").alias("max_days"),
    )


# Scale-mode twin of cycle_time_percentiles on the mergeable-sketch path.
_CYCLE_EPS = 0.04


@query(
    "cycle_time_percentiles_approx",
    oracle=f"""
    WITH spans AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(max(l.l_shipdate) AS DATE)) AS cycle_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ), g AS (
        SELECT o_orderpriority,
               count(*) AS n_orders,
               max(cycle_days) AS max_days,
               approx_quantile(cycle_days, [0.50, 0.90]) AS ap,
               quantile_cont(cycle_days, [{0.50 - _CYCLE_EPS}, {0.90 - _CYCLE_EPS},
                                          {0.50 + _CYCLE_EPS}, {0.90 + _CYCLE_EPS}]) AS bd
        FROM spans GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_orders, CAST(max_days AS BIGINT) AS max_days,
           CAST(ap[1] BETWEEN bd[1] AND bd[3] AS INT) AS p50_ok,
           CAST(ap[2] BETWEEN bd[2] AND bd[4] AS INT) AS p90_ok
    FROM g
    """,
)
def cycle_time_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-mode twin of cycle_time_percentiles: p50/p90 cycle time per
    priority band via approx_percentile — O(accuracy) mergeable per-group
    state instead of buffering every order's duration, i.e. the plan run
    when bands are unbounded. Contract: bounded-rank-error flags (each
    engine's own sketch value inside its own exact q±4% band — wider than
    percentile_agg_approx's because integer-day durations tie heavily);
    n_orders and max_days stay exact and engine-invariant. The exact band
    aggregate is the validation harness, not the operator."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__last_ship"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("__last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("cycle_days"),
        )
    )
    g = spans.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("cycle_days").cast("long").alias("max_days"),
        F.percentile_approx(
            "cycle_days", F.array(F.lit(0.50), F.lit(0.90)), 10000
        ).alias("__ap"),
        # one array aggregate for all band edges (lo pair then hi pair)
        F.percentile(
            "cycle_days",
            F.array(
                F.lit(0.50 - _CYCLE_EPS),
                F.lit(0.90 - _CYCLE_EPS),
                F.lit(0.50 + _CYCLE_EPS),
                F.lit(0.90 + _CYCLE_EPS),
            ),
        ).alias("__bd"),
    )
    return g.select(
        "o_orderpriority",
        "n_orders",
        "max_days",
        F.element_at("__ap", 1)
        .between(F.element_at("__bd", 1), F.element_at("__bd", 3))
        .cast("int")
        .alias("p50_ok"),
        F.element_at("__ap", 2)
        .between(F.element_at("__bd", 2), F.element_at("__bd", 4))
        .cast("int")
        .alias("p90_ok"),
    )


# --------------------------------------------------------------------------
# Link prediction: Jaccard similarity of neighborhoods for NON-edges that
# share at least one neighbor (the classic common-neighbors candidate
# set) — "which parts will co-occur next".
# --------------------------------------------------------------------------
LINKPRED_TOP = 25


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH {_SQL_PART_EDGES},
    nbr AS (
        SELECT u AS node, v AS nb FROM edges
        UNION ALL
        SELECT v AS node, u AS nb FROM edges
    ), deg AS (
        SELECT node, count(*) AS d FROM nbr GROUP BY node
    ), wedge AS (
        SELECT a.node AS x, b.node AS y, count(*) AS common
        FROM nbr a JOIN nbr b ON a.nb = b.nb AND a.node < b.node
        GROUP BY a.node, b.node
    ), cand AS (
        SELECT w.x, w.y, w.common
        FROM wedge w
        LEFT JOIN edges e ON e.u = w.x AND e.v = w.y
        WHERE e.u IS NULL
    )
    SELECT c.x AS node_a, c.y AS node_b,
           CAST(c.common AS BIGINT) AS n_common,
           c.common / CAST(da.d + db.d - c.common AS DOUBLE) AS jaccard
    FROM cand c
    JOIN deg da ON da.node = c.x
    JOIN deg db ON db.node = c.y
    ORDER BY jaccard DESC, node_a, node_b
    LIMIT {LINKPRED_TOP}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors link prediction on the part co-occurrence graph:
    for every NON-adjacent pair sharing at least one neighbor, the
    Jaccard similarity of their neighborhoods; top candidates are the
    pairs most likely to co-occur next. Shares the canonical edge set
    (_part_cooccurrence_edges) with the other graph operators.

    Plan shape: candidate generation is the wedge join (nbr ⋈ nbr on the
    shared neighbor — the triangle-count shape, bounded by Σdeg², never
    all-pairs); the existing-edge exclusion is a LEFT ANTI equi-join;
    degrees broadcast back; top-k is a total (score, a, b) order. On a
    skewed graph, cap the hub fan-out the way dedup caps buckets —
    documented recall knob, not needed at the demo cap."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    nbr = edges.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        edges.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    a = nbr.select(F.col("node").alias("x"), "nb")
    b = nbr.select(F.col("node").alias("y"), "nb")
    wedge = (
        a.join(b, "nb")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        edges,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("x"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("y"), F.col("d").alias("db"))
    return (
        cand.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.col("common").cast("long").alias("n_common"),
            (
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "node_a", "node_b")
        .limit(LINKPRED_TOP)
    )


# --------------------------------------------------------------------------
# Markov stationary distribution: unrolled power iteration over the
# event-type transition matrix — where user journeys settle long-run.
# --------------------------------------------------------------------------
_MARKOV_ITERS = 3


def _markov_oracle() -> str:
    from ..registry import ORACLES

    fold = (
        "list_reduce([0.0] || list_transform(list_sort(list(struct_pack("
        "s := src, t := {term}))), __x -> __x.t), (a, b) -> a + b)"
    )
    ctes = [
        f"counts AS MATERIALIZED ({ORACLES['event_transitions']})",
        "tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_n FROM counts GROUP BY src)",
        "p AS (SELECT c.src, c.dst, c.n / CAST(t.row_n AS DOUBLE) AS prob"
        "      FROM counts c JOIN tot t ON t.src = c.src)",
        "states AS (SELECT DISTINCT src AS state FROM counts)",
        "k AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM states)",
        "v0 AS (SELECT state, 1.0 / k.ns AS prob FROM states CROSS JOIN k)",
    ]
    prev = "v0"
    for i in range(1, _MARKOV_ITERS + 1):
        ctes.append(
            f"v{i} AS ("
            f" SELECT p.dst AS state, {fold.format(term='v.prob * p.prob')} AS prob"
            f" FROM {prev} v JOIN p ON p.src = v.state GROUP BY p.dst)"
        )
        prev = f"v{i}"
    return (
        "WITH " + ", ".join(ctes) + f" SELECT state, prob AS pi_approx FROM {prev}"
    )


@query("markov_stationary", oracle=_markov_oracle())
def markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the event-type Markov chain:
    row-normalize the REGISTERED transition counts (event_transitions,
    composed on both sides), start uniform, and apply the transition
    matrix 3 times (unrolled power iteration). Where user journeys
    concentrate in the long run — the steady-state complement of the
    funnel operators.

    Determinism: each matrix-vector product sums |states| float terms
    through a src-sorted struct fold with a 0.0 seed (the emb_centroids
    discipline), so both engines accumulate bit-identically; the
    normalized probabilities are single IEEE divisions of exact counts.
    Plan shape: every join keys on the state id over a |types|²-row
    matrix — driver-scale relations end to end; only the composed
    transition count ever touches fact rows."""
    from ..registry import QUERIES

    counts = QUERIES["event_transitions"](spark, sf_dir)
    tot = counts.groupBy("src").agg(F.sum("n").alias("row_n"))
    p = counts.join(tot, "src").select(
        "src", "dst", (F.col("n") / F.col("row_n").cast("double")).alias("pprob")
    )
    states = counts.select(F.col("src").alias("state")).distinct()
    k = states.agg(F.count(F.lit(1)).cast("double").alias("ns"))
    v = states.crossJoin(F.broadcast(k)).select(
        "state", (F.lit(1.0) / F.col("ns")).alias("vprob")
    )
    fold = (
        "aggregate(transform(ds, __x -> __x.t), CAST(0.0 AS DOUBLE),"
        " (a, b) -> a + b)"
    )
    for _ in range(_MARKOV_ITERS):
        terms = v.join(p, F.col("state") == F.col("src")).select(
            F.col("dst").alias("nstate"),
            F.col("src").alias("s"),
            (F.col("vprob") * F.col("pprob")).alias("t"),
        )
        v = (
            terms.groupBy("nstate")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("s"), F.col("t")))
                ).alias("ds")
            )
            .select(F.col("nstate").alias("state"), F.expr(fold).alias("vprob"))
        )
    return v.select("state", F.col("vprob").alias("pi_approx"))


# --------------------------------------------------------------------------
# Z-order vs single-dimension clustering: measured 2-D skipping — WHY a
# lakehouse z-orders files instead of sorting on one column.
# --------------------------------------------------------------------------
_ZSE_P = (100, 199)   # partkey%1024 predicate range (~10% selective)
_ZSE_S = (300, 449)   # suppkey%1024 predicate range (~15% selective)
_ZSE_LINEAR_DIV = 16  # px div 16 -> 64 single-dim-clustered buckets
_ZSE_Z_DIV = 16384    # zval div 16384 -> 64 z-ordered buckets


def _zse_layout_sql(bucket_expr: str, layout: str, pred: str) -> str:
    p1, p2 = _ZSE_P
    s1, s2 = _ZSE_S
    if pred == "2d":
        match = f"px BETWEEN {p1} AND {p2} AND sx BETWEEN {s1} AND {s2}"
        skip = (
            f"max(px) < {p1} OR min(px) > {p2}"
            f" OR max(sx) < {s1} OR min(sx) > {s2}"
        )
    else:  # sx_only — the dimension the linear layout is NOT clustered on
        match = f"sx BETWEEN {s1} AND {s2}"
        skip = f"max(sx) < {s1} OR min(sx) > {s2}"
    return f"""
        SELECT '{layout}' AS layout,
               '{pred}' AS predicate,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(skip) AS BIGINT) AS n_skipped_buckets,
               CAST(sum(n_rows) AS BIGINT) AS rows_total,
               CAST(sum(n_rows * skip) AS BIGINT) AS rows_skipped,
               CAST(sum(n_match) AS BIGINT) AS n_matching_rows,
               CAST(sum(n_match * skip) AS BIGINT) AS n_false_skips
        FROM (
            SELECT {bucket_expr} AS bucket_id,
                   count(*) AS n_rows,
                   sum(CASE WHEN {match} THEN 1 ELSE 0 END) AS n_match,
                   CASE WHEN {skip} THEN 1 ELSE 0 END AS skip
            FROM z GROUP BY 1
        )"""


@query(
    "zorder_skipping_effectiveness",
    oracle=f"""
    WITH keyed AS (
        SELECT (l_partkey % 1024) AS px, (l_suppkey % 1024) AS sx
        FROM lineitem
    ), z AS (
        SELECT px, sx, {_z_interleave_duck("px", "sx")} AS zval FROM keyed
    )
    {_zse_layout_sql(f"px // {_ZSE_LINEAR_DIV}", "linear_px", "2d")}
    UNION ALL
    {_zse_layout_sql(f"zval // {_ZSE_Z_DIV}", "zorder", "2d")}
    UNION ALL
    {_zse_layout_sql(f"px // {_ZSE_LINEAR_DIV}", "linear_px", "sx_only")}
    UNION ALL
    {_zse_layout_sql(f"zval // {_ZSE_Z_DIV}", "zorder", "sx_only")}
    """,
)
def zorder_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHY z-order, measured: zone-map pruning under two 64-bucket layouts
    (clustered on partkey alone vs Morton-interleaved (px, sx)) for two
    predicates — the 2-D range AND the suppkey-only range. The sx_only
    rows are the textbook motivation: a partkey-clustered layout prunes
    ZERO buckets for a suppkey predicate (every bucket spans all of sx),
    while the z-order curve keeps both dimensions partially local so
    either predicate prunes (measured at sf0.1: linear 0/64 vs z-order
    ~48/64 skipped for sx_only; 57 vs 60 for the 2-D predicate). Every
    row carries the data_skipping_zonemap soundness witness (matching
    rows inside skipped buckets = 0) and the exact matching-row count is
    layout-invariant, so the comparison is apples-to-apples.

    Plan shape: one scan computes px/sx/zval; each (layout, predicate)
    row is ONE bucket-keyed aggregation (zone stats + match counts in the
    same pass) and a 64-row rollup. Bucket assignment here is pure
    arithmetic on the clustering key — the write-path analog is a one-time
    repartitionByRange on the same key. Honest trade-off, visible in the
    2d rows: z-order slightly DILUTES single-dimension locality (57 vs 60
    is close because the px predicate still prunes well) — the win is
    robustness across query dimensions, not dominance on any one; and the
    curve only helps once each dimension fills its interleaved bit-width
    (at tiny domains the coarse z buckets split on one dimension's high
    bits only)."""
    p1, p2 = _ZSE_P
    s1, s2 = _ZSE_S
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        (F.col("l_partkey") % 1024).alias("px"),
        (F.col("l_suppkey") % 1024).alias("sx"),
    ).withColumn("zval", F.expr(_z_interleave_spark("px", "sx")))

    def layout(bucket_col, name: str, pred: str):
        if pred == "2d":
            match = F.col("px").between(p1, p2) & F.col("sx").between(s1, s2)
        else:
            match = F.col("sx").between(s1, s2)
        per = z.groupBy(bucket_col.alias("bucket_id")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(match.cast("int")).alias("n_match"),
            F.min("px").alias("px_lo"),
            F.max("px").alias("px_hi"),
            F.min("sx").alias("sx_lo"),
            F.max("sx").alias("sx_hi"),
        )
        sx_skip = (F.col("sx_hi") < s1) | (F.col("sx_lo") > s2)
        if pred == "2d":
            skip = (
                (F.col("px_hi") < p1) | (F.col("px_lo") > p2) | sx_skip
            ).cast("int")
        else:
            skip = sx_skip.cast("int")
        return per.withColumn("skip", skip).agg(
            F.lit(name).alias("layout"),
            F.lit(pred).alias("predicate"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("skip").cast("long").alias("n_skipped_buckets"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.col("n_rows") * F.col("skip")).cast("long").alias(
                "rows_skipped"
            ),
            F.sum("n_match").cast("long").alias("n_matching_rows"),
            F.sum(F.col("n_match") * F.col("skip")).cast("long").alias(
                "n_false_skips"
            ),
        )

    lin = F.expr(f"px div {_ZSE_LINEAR_DIV}")
    zb = F.expr(f"zval div {_ZSE_Z_DIV}")
    return (
        layout(lin, "linear_px", "2d")
        .unionAll(layout(zb, "zorder", "2d"))
        .unionAll(layout(lin, "linear_px", "sx_only"))
        .unionAll(layout(zb, "zorder", "sx_only"))
    )


# --------------------------------------------------------------------------
# Gini coefficient: how concentrated is customer revenue within each nation?
# --------------------------------------------------------------------------
@query(
    "gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT c.c_custkey, c.c_nationkey, coalesce(o.cents, 0) AS cents
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ) o ON o.o_custkey = c.c_custkey
    ), ranked AS (
        SELECT c_nationkey, cents,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY cents, c_custkey
               ) AS rk
        FROM rev
    ), g AS (
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(sum(cents) AS HUGEINT) AS s,
               sum(CAST(rk AS HUGEINT) * cents) AS rs
        FROM ranked GROUP BY 1
    )
    SELECT n.n_name,
           CAST(g.n_customers AS BIGINT) AS n_customers,
           CAST(g.s AS BIGINT) AS total_cents,
           -- VARCHAR route: DuckDB HUGEINT->DOUBLE is not correctly rounded.
           CAST(CAST(2 * g.rs - (g.n_customers + 1) * g.s AS VARCHAR)
                AS DOUBLE)
               / nullif(CAST(CAST(CAST(g.n_customers AS HUGEINT) * g.s
                                  AS VARCHAR) AS DOUBLE), 0.0) AS gini
    FROM g JOIN nation n ON n.n_nationkey = g.c_nationkey
    """,
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of lifetime order revenue across each nation's
    customers — the inequality measure a monetization or sampling analysis
    reports next to pareto_topshare's coverage prefix. Customers with no
    orders count at zero revenue (a Gini that silently drops them
    understates concentration). Uses the rank form
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending-revenue
    ranks with c_custkey as the deterministic tie-break.

    Exactness discipline: revenue quantizes to integer cents; rank
    products accumulate in DECIMAL(38,0)/HUGEINT; the single final
    division is the only float op (oracle converts via VARCHAR — DuckDB's
    HUGEINT->DOUBLE cast is 1-ulp sloppy). An all-zero-revenue group
    nulls out on both engines via nullif.

    Scale posture: one fact shuffle (orders -> per-customer sums), one
    equi-join on c_custkey, broadcast nation lookup. The per-nation
    row_number is a sort within the group — the inherent cost of an exact
    order statistic; at extreme per-group cardinality swap in the
    equi-depth-histogram Gini approximation (histogram_equi_depth's
    boundary machinery) and keep this exact form for auditing."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    rev = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_nationkey",
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    ranked = rev.withColumn("rk", F.row_number().over(w))
    g = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("cents")).alias("rs"),
    )
    return g.join(
        F.broadcast(nation), g.c_nationkey == nation.n_nationkey
    ).select(
        "n_name",
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("s").cast("long").alias("total_cents"),
        (
            (2 * F.col("rs") - (F.col("n_customers") + 1) * F.col("s")).cast(
                "double"
            )
            / F.nullif(
                (F.col("n_customers").cast("decimal(38,0)") * F.col("s")).cast(
                    "double"
                ),
                F.lit(0.0),
            )
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Delete-one-bucket jackknife: a distributed standard error for a mean.
# --------------------------------------------------------------------------
JACK_BUCKETS = 32


@query(
    "jackknife_bucket_ci",
    oracle=f"""
    WITH c AS (
        SELECT o_orderkey % {JACK_BUCKETS} AS b,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), per_b AS (
        SELECT b, CAST(sum(cents) AS BIGINT) AS s_b,
               CAST(count(*) AS BIGINT) AS c_b
        FROM c GROUP BY b
    ), g AS (
        SELECT list_sort(list(struct_pack(b := b, s_b := s_b, c_b := c_b)))
                   AS lst,
               CAST(sum(s_b) AS BIGINT) AS s_tot,
               CAST(sum(c_b) AS BIGINT) AS n_tot
        FROM per_b
    ), loo AS (
        SELECT s_tot, n_tot,
               list_transform(lst,
                   x -> CAST(s_tot - x.s_b AS DOUBLE)
                        / CAST(n_tot - x.c_b AS DOUBLE)) AS loos
        FROM g
    ), m AS (
        SELECT s_tot, n_tot, loos,
               list_reduce([0.0] || loos, (a, b) -> a + b)
                   / {JACK_BUCKETS} AS mean_loo
        FROM loo
    )
    SELECT n_tot AS n_orders,
           CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE) AS mean_cents,
           sqrt(list_reduce(
                    [0.0] || list_transform(
                        loos, x -> (x - mean_loo) * (x - mean_loo)),
                    (a, b) -> a + b) * 31.0 / 32.0) AS se_cents
    FROM m
    """,
)
def jackknife_bucket_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket (delete-d) jackknife standard error for mean
    order value — the distributed answer to "how uncertain is this
    aggregate?" when bootstrap resampling is too expensive to run over a
    fact table. Rows are assigned to B=32 deterministic buckets by key
    arithmetic (no RNG state, reproducible across engines and runs);
    each leave-one-bucket-out mean is recomputed from the bucket sums
    alone, so the second stage never touches fact rows.

    Exactness discipline: bucket sums are integer cents; every
    leave-one-out mean is a single exact-rounded division of exact
    integers; the two B-length float reductions (mean of the
    pseudo-values, sum of squared deviations) fold in sorted bucket
    order with a 0.0 seed — the bounded-group sorted-fold discipline
    (B=32, never fact-scale). sqrt is IEEE-correctly-rounded on both
    engines.

    Scale posture: ONE fact-table shuffle (groupBy bucket, map-side
    partial sums collapse to <=B rows per task); everything after is a
    32-row single-partition fold. At 100 TB the bucket sums exceed
    int64 range ~ at 10^18 cents — swap the accumulator to
    DECIMAL(38,0) (the corr_exact pattern) with no shape change."""
    orders = load_table(spark, sf_dir, "orders")
    per_b = (
        orders.select(
            (F.col("o_orderkey") % JACK_BUCKETS).alias("b"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("b")
        .agg(
            F.sum("cents").cast("long").alias("s_b"),
            F.count(F.lit(1)).cast("long").alias("c_b"),
        )
    )
    g = per_b.agg(
        F.sort_array(F.collect_list(F.struct("b", "s_b", "c_b"))).alias("lst"),
        F.sum("s_b").cast("long").alias("s_tot"),
        F.sum("c_b").cast("long").alias("n_tot"),
    )
    loo = g.select(
        "s_tot",
        "n_tot",
        F.expr(
            "transform(lst, x -> CAST(s_tot - x.s_b AS DOUBLE)"
            " / CAST(n_tot - x.c_b AS DOUBLE))"
        ).alias("loos"),
    )
    m = loo.select(
        "s_tot",
        "n_tot",
        "loos",
        (
            F.expr("aggregate(loos, CAST(0.0 AS DOUBLE), (a, b) -> a + b)")
            / F.lit(float(JACK_BUCKETS))
        ).alias("mean_loo"),
    )
    return m.select(
        F.col("n_tot").alias("n_orders"),
        (F.col("s_tot").cast("double") / F.col("n_tot").cast("double")).alias(
            "mean_cents"
        ),
        F.sqrt(
            F.expr(
                "aggregate(transform(loos,"
                " x -> (x - mean_loo) * (x - mean_loo)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            * F.lit(31.0)
            / F.lit(32.0)
        ).alias("se_cents"),
    )


# --------------------------------------------------------------------------
# Multi-source BFS hop distance — the frontier-expansion iterative shape.
# --------------------------------------------------------------------------
BFS_MAX_HOPS = 3
BFS_SEED_MOD = 17


@query(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE {_SQL_PART_EDGES}, dir AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v AS src, u AS dst FROM edges
    ), nodes AS (
        SELECT DISTINCT src AS node FROM dir
    ), walk(node, d) AS (
        SELECT node, 0 FROM nodes WHERE node % {BFS_SEED_MOD} = 0
        UNION
        SELECT e.dst, w.d + 1
        FROM walk w JOIN dir e ON e.src = w.node
        WHERE w.d < {BFS_MAX_HOPS}
    ), md AS (
        SELECT node, min(d) AS dist FROM walk GROUP BY node
    )
    SELECT CAST(dist AS INTEGER) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM md GROUP BY dist
    UNION ALL
    SELECT -1 AS dist,
           CAST((SELECT count(*) FROM nodes)
                - (SELECT count(*) FROM md) AS BIGINT) AS n_nodes
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop-distance histogram over the part co-occurrence
    graph: distance from the nearest seed (every node with
    id % 17 == 0 — deterministic, no RNG, no collect) for each
    reachable node, capped at 3 hops, with an explicit dist=-1 row
    for the unreached remainder. The "how far is everything from the
    labeled set" primitive behind semi-supervised label spreading,
    crawl-frontier accounting, and contamination blast-radius checks.

    Pregel-without-Pregel: the loop only BUILDS the plan (no driver data
    loop). Each round is one equi-join of the frontier against the
    directed adjacency plus an anti-join against the visited set; both
    small sides are vertex-scale, so they ride explicit broadcasts, and
    each round's visited set persists — round r+1's anti-join and the
    final histogram both read it, and without the cache the nested
    broadcast chains recompute combinatorially (the kcore lesson,
    plans/scale_ext.py). The adjacency coalesces to its own cardinality
    before the loop so fact-scan parallelism does not leak into
    vertex-scale iterations. Monotone convergence: the frontier shrinks
    to empty no later than the graph diameter; the hop cap bounds the
    unrolled plan depth. At |V| beyond broadcast size, drop the hints —
    the joins degrade to keyed shuffles with the same semantics."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    dirs = (
        edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .coalesce(1)
        .persist()
    )
    nodes = dirs.select(F.col("src").alias("node")).distinct()
    known = (
        nodes.filter(F.col("node") % BFS_SEED_MOD == 0)
        .select("node", F.lit(0).alias("dist"))
        .persist()
    )
    frontier = known
    for r in range(1, BFS_MAX_HOPS + 1):
        neigh = (
            dirs.join(
                F.broadcast(frontier.select(F.col("node").alias("src"))), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = neigh.join(F.broadcast(known), "node", "left_anti").select(
            "node", F.lit(r).alias("dist")
        )
        known = known.unionAll(new).persist()
        frontier = new
    hist = known.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    unreached = (
        nodes.join(F.broadcast(known.select("node")), "node", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.lit(-1).alias("dist"), "n_nodes")
    )
    return hist.unionAll(unreached)


# --------------------------------------------------------------------------
# Modularity audit of the label-propagation communities.
# --------------------------------------------------------------------------
def _modularity_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH lab AS MATERIALIZED ({ORACLES['graph_label_propagation']}),
    {_SQL_PART_EDGES},
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges
    ), intra AS (
        SELECT la.label AS community,
               CAST(count(*) AS BIGINT) AS intra_edges
        FROM edges e
        JOIN lab la ON la.node = e.u
        JOIN lab lb ON lb.node = e.v
        WHERE la.label = lb.label
        GROUP BY la.label
    ), deg AS (
        SELECT l.label AS community,
               CAST(count(*) AS BIGINT) AS degree_sum,
               CAST(count(DISTINCT d.node) AS BIGINT) AS n_nodes
        FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) d JOIN lab l ON l.node = d.node
        GROUP BY l.label
    )
    SELECT d.community,
           d.n_nodes,
           d.degree_sum,
           CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           CAST(4 * m.n_edges * coalesce(i.intra_edges, 0)
                - d.degree_sum * d.degree_sum AS DOUBLE)
               / CAST(4 * m.n_edges * m.n_edges AS DOUBLE) AS q_term
    FROM deg d
    LEFT JOIN intra i ON i.community = d.community
    CROSS JOIN m
    """


@query("graph_modularity", oracle=_modularity_oracle())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity terms for the communities graph_label_propagation
    found — the quality audit that tells you whether the partition is
    real structure or noise (Q = Σ q_term; q_term = e_c/m − (d_c/2m)²,
    positive when a community holds more internal edges than a random
    degree-preserving rewiring would). Composes the REGISTERED community
    query, so the audit always measures the labels the engine actually
    ships — the same composition pattern as dedup_cluster_keeper_quality.

    Exactness: per-community terms are computed from exact integer edge
    counts and degree sums via the single pinned division
    (4·m·e_c − d_c²)/(4·m²); emitting per-community rows (not the global
    Q) keeps every aggregation integer — summing the float terms across
    an unbounded community set would be partition-order-dependent, so
    that last reduction is left to the (bounded, sorted) consumer.

    Plan: labels are vertex-scale → both endpoint joins ride broadcasts;
    the 1-row edge total is a broadcast crossJoin; intra/degree counts
    key on the community id. Integer overflow bound: 4·m·e_c < 2^63
    until m ~ 1.5e9 edges — past that, swap the numerator to
    DECIMAL(38,0) (corr_exact pattern), same shape."""
    edges = _part_cooccurrence_edges(spark, sf_dir).coalesce(1).persist()
    from ..registry import QUERIES

    # eager-materialize both caches: three broadcast builds read the
    # labels and two branches read the edges CONCURRENTLY — an
    # unmaterialized cache gets recomputed per consumer (the iterative
    # LPA chain, measured 4.1 s -> 2.9 s at sf0.001)
    edges.count()
    lab = QUERIES["graph_label_propagation"](spark, sf_dir).coalesce(1).persist()
    lab.count()
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    la = lab.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lb = lab.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    intra = (
        edges.join(F.broadcast(la), "u")
        .join(F.broadcast(lb), "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = (
        ends.join(F.broadcast(lab), "node")
        .groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("degree_sum"),
            F.countDistinct("node").cast("long").alias("n_nodes"),
        )
    )
    return (
        deg.join(intra, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "degree_sum",
            F.coalesce(F.col("intra_edges"), F.lit(0))
            .cast("long")
            .alias("intra_edges"),
            (
                (
                    4 * F.col("n_edges") * F.coalesce("intra_edges", F.lit(0))
                    - F.col("degree_sum") * F.col("degree_sum")
                ).cast("double")
                / (4 * F.col("n_edges") * F.col("n_edges")).cast("double")
            ).alias("q_term"),
        )
    )


# --------------------------------------------------------------------------
# Degree assortativity: do hubs connect to hubs? Pearson over edge endpoints.
# --------------------------------------------------------------------------
@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_SQL_PART_EDGES}, dir AS (
        SELECT u AS src, v AS dst FROM edges
        UNION ALL
        SELECT v AS src, u AS dst FROM edges
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM dir GROUP BY src
    ), ends AS (
        SELECT da.d AS x, db.d AS y
        FROM dir e
        JOIN deg da ON da.node = e.src
        JOIN deg db ON db.node = e.dst
    ), m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
        FROM ends
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           (n * sxy - sx * sy)
               / nullif(sqrt(n * sxx - sx * sx)
                        * sqrt(n * syy - sy * sy), 0.0) AS assortativity
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-occurrence graph: Pearson
    correlation of endpoint degrees over every directed edge (Newman's
    r) — positive means hubs preferentially link to hubs (social-graph
    shape), negative means hub-and-spoke (infrastructure shape). For a
    data engine this is a PLANNING signal: disassortative graphs
    concentrate wedge counts and frontier expansions through few
    high-degree nodes, which is exactly when triangle counting and BFS
    need their skew guards.

    Exactness: degrees are exact integer counts; the Pearson assembly
    is corr_exact's pinned cast-then-arithmetic order over DECIMAL
    intermediate sums (both edge directions included, so x/y moments
    are symmetric and r is orientation-free). A degree-regular graph
    (zero variance) nulls out via nullif instead of dividing by zero.

    Plan: one degree aggregation, two node-keyed lookups of it onto the
    edge list (vertex-scale side — broadcast), one moment pass. Nothing
    beyond the edge build touches fact scale."""
    edges = _part_cooccurrence_edges(spark, sf_dir)
    dirs = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).coalesce(1).persist()
    dirs.count()
    deg = dirs.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("x"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("y"))
    ends = (
        dirs.join(F.broadcast(da), dirs.src == da.a)
        .join(F.broadcast(db), dirs.dst == db.b)
        .select("x", "y")
    )
    m = ends.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    return m.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# Two-feature OLS with intercept, closed-form via Cramer's rule on exact
# integer normal-equation moments.
# --------------------------------------------------------------------------
@query(
    "ols_two_feature",
    oracle="""
    WITH b AS (
        SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
               CAST(round(l_discount * 100) AS BIGINT) AS x2,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS s2,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x1) AS DOUBLE) AS s11,
               CAST(sum(CAST(x1 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s12,
               CAST(sum(CAST(x2 AS DECIMAL(38,0)) * x2) AS DOUBLE) AS s22,
               CAST(sum(CAST(x1 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s1y,
               CAST(sum(CAST(x2 AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2y,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM b
    ), d AS (
        SELECT n, sy, s1y, s2y, syy,
               n * (s11 * s22 - s12 * s12)
                   - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det,
               sy * (s11 * s22 - s12 * s12)
                   - s1 * (s1y * s22 - s12 * s2y)
                   + s2 * (s1y * s12 - s11 * s2y) AS det0,
               n * (s1y * s22 - s12 * s2y)
                   - sy * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s2y - s1y * s2) AS det1,
               n * (s11 * s2y - s1y * s12)
                   - s1 * (s1 * s2y - s1y * s2)
                   + sy * (s1 * s12 - s11 * s2) AS det2
        FROM m
    )
    SELECT n AS n_rows,
           det0 / det AS beta0,
           det1 / det AS beta1,
           det2 / det AS beta2,
           1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                      - (det2 / det) * s2y)
                 / nullif(syy - sy * (sy / n), 0.0) AS r2
    FROM d
    """,
)
def ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple regression: extendedprice (cents) on quantity
    and discount (pct) with intercept — the 2-feature generalization of
    grouped_linear_fit, solved by Cramer's rule on the 3x3 normal
    equations. The single-pass moment formulation is THE scalable shape:
    at any corpus size the regression costs one partial-aggregatable
    scan producing 10 numbers; no gradient loop, no per-row residual
    pass (SSE comes from the algebraic identity SSE = Syy − βᵀXᵀy).

    Exactness: inputs are exact integers (cents / pct); all ten moments
    accumulate in DECIMAL(38,0) and cast once to DOUBLE (every moment
    except Σy² is < 2^53, i.e. exactly representable; Σy² takes one
    correctly-rounded cast identical on both engines); the three Cramer
    determinants and the R² assembly are PINNED arithmetic trees —
    every multiply/divide has identical operands on both engines, so
    IEEE correct rounding makes them bit-equal.

    Plan: ONE HashAggregate pass over the scan (map-side partials),
    then 1-row arithmetic. No shuffle of data rows."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr("CAST(round(l_quantity) AS BIGINT)").alias("x1"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("x2"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("y"),
    )

    def dsum(e):
        return F.sum(e).cast("double")

    dec = lambda c: F.col(c).cast("decimal(38,0)")
    m = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(dec("x1")).alias("s1"),
        dsum(dec("x2")).alias("s2"),
        dsum(dec("y")).alias("sy"),
        dsum(dec("x1") * F.col("x1")).alias("s11"),
        dsum(dec("x1") * F.col("x2")).alias("s12"),
        dsum(dec("x2") * F.col("x2")).alias("s22"),
        dsum(dec("x1") * F.col("y")).alias("s1y"),
        dsum(dec("x2") * F.col("y")).alias("s2y"),
        dsum(dec("y") * F.col("y")).alias("syy"),
    )
    n, s1, s2, sy = (F.col(c) for c in ("n", "s1", "s2", "sy"))
    s11, s12, s22 = (F.col(c) for c in ("s11", "s12", "s22"))
    s1y, s2y, syy = (F.col(c) for c in ("s1y", "s2y", "syy"))
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * (sy / n)
    return m.select(
        F.col("n").alias("n_rows"),
        b0.alias("beta0"),
        b1.alias("beta1"),
        b2.alias("beta2"),
        (F.lit(1.0) - sse / F.nullif(sst, F.lit(0.0))).alias("r2"),
    )


# --------------------------------------------------------------------------
# Bounded-hop weighted shortest distance (Bellman-Ford relaxation rounds).
# --------------------------------------------------------------------------
SSSP_ROUNDS = 3
SSSP_SEED_MOD = BFS_SEED_MOD  # same deterministic seed set as the BFS


@query(
    "graph_weighted_sssp",
    oracle=f"""
    WITH RECURSIVE picked AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey <= {_PART_EDGE_CAP}
    ), wedges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(greatest(1, 6 - least(count(*), 5)) AS BIGINT) AS w
        FROM picked a JOIN picked b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ), dir AS (
        SELECT u AS src, v AS dst, w FROM wedges
        UNION ALL
        SELECT v AS src, u AS dst, w FROM wedges
    ), nodes AS (
        SELECT DISTINCT src AS node FROM dir
    ), walk(node, d, h) AS (
        SELECT node, CAST(0 AS BIGINT), 0 FROM nodes
        WHERE node % {SSSP_SEED_MOD} = 0
        UNION
        SELECT e.dst, w.d + e.w, w.h + 1
        FROM walk w JOIN dir e ON e.src = w.node
        WHERE w.h < {SSSP_ROUNDS}
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist
    FROM walk GROUP BY node
    """,
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest distance from the BFS seed set after K = 3
    Bellman-Ford relaxation rounds — the weighted upgrade of
    graph_bfs_distance: edge length = greatest(1, 6 − min(co_count, 5)),
    so strongly co-purchased parts are CLOSE (affinity distance). After
    K rounds every node holds its exact min-cost path over ≤ K hops —
    the standard bounded-iteration semantics of distributed SSSP
    (Pregel/GraphX stop the same way; the round budget is the published
    knob, and one more unroll step extends the horizon).

    Exactness: weights and path costs are exact integers; each round is
    a min() of integers — no floats anywhere.

    Plan: the weighted adjacency builds from the same co-keyed
    order-self-join as every part-graph operator (then coalesces to its
    own vertex-scale cardinality); each relaxation round is ONE
    broadcast equi-join of the current distance table against the
    adjacency plus a node-keyed min rollup, PERSISTED per round (the
    iterative-plan lesson — unreused rounds recompute combinatorially).
    At |V| beyond broadcast size the joins degrade to keyed shuffles
    with identical semantics."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") <= _PART_EDGE_CAP
    )
    picked = li.select("l_orderkey", "l_partkey")
    a = picked.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = picked.select("l_orderkey", F.col("l_partkey").alias("v"))
    wedges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.greatest(
                F.lit(1), F.lit(6) - F.least(F.count(F.lit(1)), F.lit(5))
            )
            .cast("long")
            .alias("w")
        )
    )
    dirs = (
        wedges.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionAll(
            wedges.select(
                F.col("v").alias("src"), F.col("u").alias("dst"), "w"
            )
        )
        .coalesce(1)
        .persist()
    )
    dirs.count()
    known = (
        dirs.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % SSSP_SEED_MOD == 0)
        .select("node", F.lit(0).cast("long").alias("dist"))
        .persist()
    )
    known.count()
    for _ in range(SSSP_ROUNDS):
        cand = (
            dirs.join(
                F.broadcast(known.withColumnRenamed("node", "src")), "src"
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        known = (
            known.unionAll(cand)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .persist()
        )
        known.count()
    return known


# --------------------------------------------------------------------------
# Next-event predictability: Gini impurity of each state's transition row.
# --------------------------------------------------------------------------
def _transition_gini_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH tr AS MATERIALIZED ({ORACLES['event_transitions']}),
    per_src AS (
        SELECT src,
               CAST(count(*) AS BIGINT) AS n_dst,
               CAST(sum(n) AS BIGINT) AS n_total,
               CAST(sum(CAST(n AS DECIMAL(38,0)) * n) AS BIGINT) AS sum_sq
        FROM tr GROUP BY src
    )
    SELECT src, n_dst, n_total,
           1.0 - CAST(sum_sq AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * n_total) AS gini_impurity
    FROM per_src
    """


@query("markov_transition_gini", oracle=_transition_gini_oracle())
def markov_transition_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state next-event predictability: the Gini impurity
    1 − Σp² of each event type's outgoing transition distribution —
    the LOG-FREE uncertainty measure (entropy's rational twin, the same
    move text_collocation_pmi makes with lift): 0 = next event fully
    determined, (k−1)/k = uniform over k successors. Ranks states by
    how much signal a next-event model can extract, and complements
    markov_stationary (where the chain spends time) and
    event_transitions (the raw matrix this composes).

    Exactness: transition counts are integers off the registered query;
    Σn² accumulates in DECIMAL(38,0); the impurity is one division of
    exact operands (denominator written n·n, both factors exact) — no
    logs, no folds, nothing order-sensitive.

    Plan: adds ONE |types|-keyed rollup over the |types|² transition
    matrix — free next to the lead() window that builds it."""
    from ..registry import QUERIES

    tr = QUERIES["event_transitions"](spark, sf_dir)
    per = tr.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_dst"),
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
        .cast("long")
        .alias("sum_sq"),
    )
    return per.select(
        "src",
        "n_dst",
        "n_total",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_total").cast("double") * F.col("n_total"))
        ).alias("gini_impurity"),
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution: channel credit from chain surgery.
# --------------------------------------------------------------------------
MARKOV_ATTR_H = 4  # conversion horizon (transitions)
_MA_ONE = 1_048_576  # 2^20: probabilities live on an integer grid
_MA_CONV = "purchase"  # absorbing conversion state
_MA_NONE = "__none__"  # sentinel: the un-surgered base chain


def _markov_removal_oracle() -> str:
    from ..registry import ORACLES

    parts = [
        f"""tr AS MATERIALIZED ({ORACLES['event_transitions']}),
    states AS (
        SELECT DISTINCT src AS state FROM tr
        UNION SELECT DISTINCT dst FROM tr
    ), outs AS (
        SELECT src, CAST(sum(n) AS BIGINT) AS ns FROM tr GROUP BY src
    ), chans AS (
        SELECT state AS removed FROM states WHERE state <> '{_MA_CONV}'
        UNION ALL SELECT '{_MA_NONE}'
    ), firsts AS (
        SELECT first_t, CAST(count(*) AS BIGINT) AS n_users FROM (
            SELECT event_type AS first_t,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1 GROUP BY first_t
    ), v0 AS (
        SELECT c.removed, s.state,
               CASE WHEN s.state = '{_MA_CONV}' THEN {_MA_ONE}
                    ELSE 0 END AS vq
        FROM chans c CROSS JOIN states s
    )"""
    ]
    for k in range(1, MARKOV_ATTR_H + 1):
        prev = f"v{k - 1}"
        parts.append(
            f"""v{k} AS (
        SELECT c.removed, s.state,
               CASE WHEN s.state = '{_MA_CONV}' THEN {_MA_ONE}
                    WHEN s.state = c.removed THEN 0
                    ELSE coalesce(m.vq, 0) END AS vq
        FROM chans c CROSS JOIN states s
        LEFT JOIN (
            SELECT p.removed, t.src,
                   (2 * CAST(sum(t.n * p.vq) AS BIGINT) + o.ns)
                       // (2 * o.ns) AS vq
            FROM tr t
            JOIN {prev} p ON p.state = t.dst
            JOIN outs o ON o.src = t.src
            GROUP BY p.removed, t.src, o.ns
        ) m ON m.removed = c.removed AND m.src = s.state
    )"""
        )
    last = f"v{MARKOV_ATTR_H}"
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f""", conv AS (
        SELECT v.removed,
               (2 * CAST(sum(f.n_users * v.vq) AS BIGINT)
                + CAST(sum(f.n_users) AS BIGINT))
                   // (2 * CAST(sum(f.n_users) AS BIGINT)) AS cq
        FROM {last} v JOIN firsts f ON f.first_t = v.state
        GROUP BY v.removed
    ), base AS (
        SELECT cq AS base_q FROM conv WHERE removed = '{_MA_NONE}'
    ), eff AS (
        SELECT c.removed AS channel, c.cq, b.base_q,
               greatest(b.base_q - c.cq, 0) AS eff_q
        FROM conv c CROSS JOIN base b
        WHERE c.removed <> '{_MA_NONE}'
    )
    SELECT channel,
           CAST(base_q AS DOUBLE) / {_MA_ONE}.0 AS base_conv,
           CAST(cq AS DOUBLE) / {_MA_ONE}.0 AS conv_without,
           CAST(eff_q AS DOUBLE) / nullif(CAST(base_q AS DOUBLE), 0.0)
               AS removal_effect,
           CAST(eff_q AS DOUBLE)
               / nullif(CAST(sum(eff_q) OVER () AS DOUBLE), 0.0)
               AS attribution_share
    FROM eff
    """
    )


@query("attribution_markov_removal", oracle=_markov_removal_oracle())
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: model user journeys as the
    first-order chain of event_transitions with '{conv}' absorbing at 1,
    compute each user-start's probability of converting within H=4
    transitions, then re-run the chain with each channel surgically
    removed (the removed state absorbs at 0 — visits die there). A
    channel's credit is how much the bounded-horizon conversion rate
    drops without it, normalized across channels — the data-driven
    multi-touch model that replaces positional heuristics
    (attribution_position_weighted) with chain structure.

    Exactness: probabilities live on the integer 2^-20 grid end to end —
    each value-iteration round is Σ n(s→d)·vq(d) (an order-free integer
    sum) followed by half-up integer division floor((2s+n)/(2n)); no
    float enters until the final readout divisions. The horizon is a
    fixed constant, so both engines run the identical H unrolled rounds.

    Plan: one lead() pass builds the transition matrix and one window
    pass the first-event histogram — the only fact-scale work, both in
    Spark. The |types|² ≤ 25-row matrix and ≤ |types| first-event rows
    then collect to the driver, where the H·|channels| value-iteration
    rounds run as plain integer arithmetic (the bounded-driver-state
    class, like the chart render): distributing ~25-row joins costs 8+
    seconds of pure stage scheduling for zero scalability — measured
    9.3 s distributed vs ~1.5 s collected at sf0.1.""".format(conv=_MA_CONV)
    from collections import defaultdict

    from ..registry import QUERIES

    tr_rows = QUERIES["event_transitions"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_rows = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("first_t"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .collect()
    )
    # |types|^2 matrix rows and |types| first-event rows: bounded driver
    # state (the chart-render class), NOT fact-scale — the fact-scale work
    # (the lead() window and both aggregations) already ran in Spark.
    tr = {(r["src"], r["dst"]): r["n"] for r in tr_rows}
    firsts = {r["first_t"]: r["n_users"] for r in first_rows}
    states = sorted({s for s, _ in tr} | {d for _, d in tr})
    outs = defaultdict(int)
    for (s, _), n in tr.items():
        outs[s] += n

    def run(removed) -> int:
        v = {s: (_MA_ONE if s == _MA_CONV else 0) for s in states}
        for _ in range(MARKOV_ATTR_H):
            nv = {}
            for s in states:
                if s == _MA_CONV:
                    nv[s] = _MA_ONE
                elif s == removed:
                    nv[s] = 0
                else:
                    sv = sum(
                        n * v[d] for (a, d), n in tr.items() if a == s
                    )
                    nv[s] = (2 * sv + outs[s]) // (2 * outs[s])
            v = nv
        nu = sum(firsts.values())
        sv = sum(n * v[t] for t, n in firsts.items())
        return (2 * sv + nu) // (2 * nu)

    base_q = run(None)
    chans = [s for s in states if s != _MA_CONV]
    effs = {c: max(base_q - run(c), 0) for c in chans}
    tot = sum(effs.values())
    rows = [
        (
            c,
            base_q / _MA_ONE,
            (base_q - effs[c]) / _MA_ONE,
            (effs[c] / base_q) if base_q else None,
            (effs[c] / tot) if tot else None,
        )
        for c in chans
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "channel string, base_conv double, conv_without double, "
            "removal_effect double, attribution_share double"
        ),
    )


# --------------------------------------------------------------------------
# Per-community conductance: the cut-quality twin of modularity.
# --------------------------------------------------------------------------
def _conductance_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH lab AS MATERIALIZED ({ORACLES['graph_label_propagation']}),
    {_SQL_PART_EDGES},
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges
    ), intra AS (
        SELECT la.label AS community,
               CAST(count(*) AS BIGINT) AS intra_edges
        FROM edges e
        JOIN lab la ON la.node = e.u
        JOIN lab lb ON lb.node = e.v
        WHERE la.label = lb.label
        GROUP BY la.label
    ), deg AS (
        SELECT l.label AS community,
               CAST(count(*) AS BIGINT) AS degree_sum,
               CAST(count(DISTINCT d.node) AS BIGINT) AS n_nodes
        FROM (
            SELECT u AS node FROM edges
            UNION ALL
            SELECT v AS node FROM edges
        ) d JOIN lab l ON l.node = d.node
        GROUP BY l.label
    )
    SELECT d.community, d.n_nodes,
           CAST(d.degree_sum - 2 * coalesce(i.intra_edges, 0) AS BIGINT)
               AS cut_edges,
           d.degree_sum AS volume,
           CAST(d.degree_sum - 2 * coalesce(i.intra_edges, 0) AS DOUBLE)
               / nullif(CAST(least(d.degree_sum,
                                   2 * m.n_edges - d.degree_sum)
                             AS DOUBLE), 0.0) AS conductance
    FROM deg d
    LEFT JOIN intra i ON i.community = d.community
    CROSS JOIN m
    """


@query("graph_conductance", oracle=_conductance_oracle())
def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance φ(C) = cut(C)/min(vol(C), 2m−vol(C))
    for the communities graph_label_propagation ships — the cut-quality
    twin of graph_modularity (modularity rewards internal density;
    conductance penalizes boundary leakage — a partition can score well
    on one and badly on the other, which is exactly why audits report
    both). Low φ = a well-separated community; φ → 1 = a label that cuts
    straight through structure.

    Exactness: cut = degree_sum − 2·intra is pure integer arithmetic off
    the same exact counts modularity uses; φ is ONE division with a
    nullif guard for whole-graph communities (min(vol, 2m−vol) = 0).

    Plan: identical composed shape to graph_modularity — vertex-scale
    label broadcasts onto the edge list, community-keyed counts, 1-row
    edge total broadcast. At scale the labels table outgrows broadcast →
    same keyed-shuffle fallback documented there."""
    edges = _part_cooccurrence_edges(spark, sf_dir).coalesce(1).persist()
    from ..registry import QUERIES

    edges.count()
    lab = (
        QUERIES["graph_label_propagation"](spark, sf_dir)
        .coalesce(1)
        .persist()
    )
    lab.count()
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    la = lab.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lb = lab.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    intra = (
        edges.join(F.broadcast(la), "u")
        .join(F.broadcast(lb), "v")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    ends = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = (
        ends.join(F.broadcast(lab), "node")
        .groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("degree_sum"),
            F.countDistinct("node").cast("long").alias("n_nodes"),
        )
    )
    cut = F.col("degree_sum") - 2 * F.coalesce(F.col("intra_edges"), F.lit(0))
    return (
        deg.join(intra, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            cut.cast("long").alias("cut_edges"),
            F.col("degree_sum").alias("volume"),
            (
                cut.cast("double")
                / F.nullif(
                    F.least(
                        F.col("degree_sum"),
                        2 * F.col("n_edges") - F.col("degree_sum"),
                    ).cast("double"),
                    F.lit(0.0),
                )
            ).alias("conductance"),
        )
    )


# --------------------------------------------------------------------------
# Lorenz curve deciles — the distribution picture behind the Gini number.
# --------------------------------------------------------------------------
@query(
    "lorenz_curve_deciles",
    oracle="""
    WITH rev AS (
        SELECT c.c_custkey,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                             0) AS BIGINT) AS cents
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ), ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, c_custkey) AS rn,
               count(*) OVER () AS n
        FROM rev
    ), dec AS (
        SELECT CAST(ceil(CAST(rn AS DOUBLE) * 10 / n) AS BIGINT) AS decile,
               cents
        FROM ranked
    ), per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM dec GROUP BY decile
    ), tot AS (
        SELECT CAST(sum(rev_cents) AS BIGINT) AS t,
               CAST(sum(n_customers) AS BIGINT) AS n_all
        FROM per
    )
    SELECT decile, n_customers, rev_cents,
           CAST(sum(rev_cents) OVER w AS BIGINT) AS cum_rev_cents,
           CAST(sum(rev_cents) OVER w AS DOUBLE) / t AS cum_share,
           CAST(sum(n_customers) OVER w AS DOUBLE) / n_all
             - CAST(sum(rev_cents) OVER w AS DOUBLE) / t AS equality_gap
    FROM per CROSS JOIN tot
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue by population decile (customers
    ranked poorest-first, zero-order customers included at zero — the
    same population convention as gini_concentration, whose single
    number this curve explains): cumulative revenue share per decile and
    the gap to the 45° equality line — the picture that says WHERE the
    concentration lives (a top-decile cliff vs a broad middle tilt give
    the same Gini but demand different interventions).

    Exactness: per-customer cents, ranks (total order on (cents, key)),
    decile cells, and cumulative sums are exact integers; shares and
    gaps are pinned divisions of exact operands over the 10-row decile
    relation.

    Plan: one customer-keyed outer-join rollup, a rank window
    (two-phase-swappable), a 10-row cumulative window — the windowed
    tail is decile-scale, never customer-scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        cust.join(
            orders.select(
                F.col("o_custkey").alias("c_custkey"),
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
                    "cents"
                ),
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    wr = Window.orderBy("cents", "c_custkey")
    wn = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = rev.select(
        "cents",
        F.ceil(
            F.row_number().over(wr).cast("double")
            * 10
            / F.count(F.lit(1)).over(wn)
        )
        .cast("long")
        .alias("decile"),
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )
    tot = per.agg(
        F.sum("rev_cents").cast("long").alias("t"),
        F.sum("n_customers").cast("long").alias("n_all"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "rev_cents",
            F.sum("rev_cents").over(wc).cast("long").alias("cum_rev_cents"),
            (F.sum("rev_cents").over(wc).cast("double") / F.col("t")).alias(
                "cum_share"
            ),
            (
                F.sum("n_customers").over(wc).cast("double") / F.col("n_all")
                - F.sum("rev_cents").over(wc).cast("double") / F.col("t")
            ).alias("equality_gap"),
        )
    )


# --------------------------------------------------------------------------
# Popularity-baseline hit rate: the recommender floor — "just recommend
# the bestsellers" — evaluated on a temporal split.
# --------------------------------------------------------------------------
_POP_K = 20  # recommendation list size


@query(
    "popularity_baseline_hitrate",
    oracle=f"""
    WITH mid AS (
        SELECT (min(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)))
                + max(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)))) // 2 AS m
        FROM orders
    ), fact AS (
        SELECT o.o_custkey AS cust, l.l_partkey AS part,
               date_diff('day', DATE '1970-01-01',
                         CAST(o.o_orderdate AS DATE)) AS t
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), train AS (
        SELECT part, CAST(count(*) AS BIGINT) AS c
        FROM fact CROSS JOIN mid WHERE t < m GROUP BY part
    ), topk AS (
        SELECT part FROM (
            SELECT part, row_number() OVER (ORDER BY c DESC, part) AS rk
            FROM train
        ) WHERE rk <= {_POP_K}
    ), test_users AS (
        SELECT cust, CAST(max(CASE WHEN part IN (SELECT part FROM topk)
                              THEN 1 ELSE 0 END) AS BIGINT) AS hit
        FROM fact CROSS JOIN mid WHERE t >= m
        GROUP BY cust
    )
    SELECT CAST({_POP_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_test_users,
           CAST(sum(hit) AS BIGINT) AS n_hit,
           CAST(sum(hit) AS DOUBLE) / count(*) AS hit_rate
    FROM test_users
    """,
)
def popularity_baseline_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recommender floor: recommend the {_POP_K} most-purchased parts
    of the FIRST time half to every customer, and measure the share of
    second-half purchasers who bought at least one recommended part —
    hit-rate@k of the popularity baseline under a temporal split. Every
    personalized model (item_cooccurrence_cosine is the registered
    candidate) must beat this number to justify its complexity; on
    long-tail catalogs the popularity floor is embarrassingly high, and
    measuring it first is the discipline.

    Exactness: the time midpoint, train counts, the top-k frontier
    (count desc, part — total order), per-user hit flags, and the hit
    tally are all exact integers; the rate is one division.

    Plan: one fact join (orders x lineitem, both key-partitioned), the
    1-row midpoint broadcast, a part-keyed train count with a
    TakeOrdered-style frontier, the K-part list broadcast into the
    test-half scan, a user-keyed flag rollup, a 1-row rate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fact = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).cast("long").alias("t"),
    ).join(
        li.select(F.col("l_orderkey").alias("o_orderkey"),
                  F.col("l_partkey").alias("part")),
        "o_orderkey",
    )
    day = "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
    mid = orders.agg(
        F.expr(f"(min({day}) + max({day})) DIV 2").cast("long").alias("m")
    )
    fm = fact.crossJoin(F.broadcast(mid))
    train = (
        fm.filter(F.expr("t < m"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("part"))
    topk = (
        train.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _POP_K)
        .select(F.col("part"), F.lit(1).alias("rec"))
    )
    test_users = (
        fm.filter(F.expr("t >= m"))
        .join(F.broadcast(topk), "part", "left")
        .groupBy("cust")
        .agg(
            F.max(F.coalesce(F.col("rec"), F.lit(0)))
            .cast("long")
            .alias("hit")
        )
    )
    return test_users.agg(
        F.lit(_POP_K).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_test_users"),
        F.sum("hit").cast("long").alias("n_hit"),
        (F.sum("hit").cast("double") / F.count(F.lit(1))).alias("hit_rate"),
    )


# --------------------------------------------------------------------------
# Atkinson inequality index (epsilon = 1) — the welfare-theoretic member of
# the inequality tier (Gini = rank-based, Lorenz = the curve, Atkinson =
# "how much total revenue society would give up for equality").
# --------------------------------------------------------------------------
_ATK_GRID = 1 << 20  # 2^-20 grid for per-row ln values


@query(
    "atkinson_index",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ), g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS t,
               CAST(sum(CAST(round(ln(CAST(cents AS DOUBLE)) * {_ATK_GRID})
                             AS BIGINT)) AS BIGINT) AS lq
        FROM rev
    )
    SELECT n AS n_purchasers, t AS total_cents,
           CAST(t AS DOUBLE) / n AS mean_cents,
           round(exp((CAST(lq AS DOUBLE) / {_ATK_GRID}) / n), 2) + 0.0
               AS geomean_cents,
           round(1 - exp((CAST(lq AS DOUBLE) / {_ATK_GRID}) / n)
                 / (CAST(t AS DOUBLE) / n), 6) + 0.0 AS atkinson_eps1
    FROM g
    """,
)
def atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index at aversion epsilon = 1 over purchaser
    revenue: A = 1 − geometric_mean/mean — the welfare reading ("the
    share of total revenue society would sacrifice for perfect
    equality") that Gini lacks, completing the inequality tier
    (gini_concentration the rank number, lorenz_curve_deciles the
    picture, Atkinson the welfare weight). Population = purchasers
    (cents > 0 by construction): epsilon = 1 is undefined at zero income,
    and the zero-inclusive convention lives in the Gini/Lorenz pair.

    Exactness: ln runs once per row on identical exact-integer inputs
    (identical doubles on both engines), QUANTIZES to the 2^-20 grid,
    and accumulates as a PLAIN integer sum — order-free,
    partial-aggregatable, O(1) state (the _fxp discipline applied to a
    log-mean; a raw double sum of ln terms would be fold-order-dependent
    at any scale). exp(), unlike sqrt, is NOT correctly rounded and was
    observed 1 ulp apart across engines at sf0.1, so the two
    exp-carrying outputs snap to coarse grids (cents to 2 dp, the index
    to 6 dp) that absorb the transcendental's final ulp.

    Plan: one customer-keyed rollup, one 1-row three-cell reduction —
    scan-bound at any fact size."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    g = rev.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
        F.sum(
            F.expr(
                f"CAST(round(ln(CAST(cents AS DOUBLE)) * {_ATK_GRID})"
                " AS BIGINT)"
            )
        )
        .cast("long")
        .alias("lq"),
    )
    return g.select(
        F.col("n").alias("n_purchasers"),
        F.col("t").alias("total_cents"),
        F.expr("CAST(t AS DOUBLE) / n").alias("mean_cents"),
        (
            F.round(
                F.expr(f"exp((CAST(lq AS DOUBLE) / {_ATK_GRID}) / n)"), 2
            )
            + F.lit(0.0)
        ).alias("geomean_cents"),
        (
            F.round(
                F.expr(
                    f"1 - exp((CAST(lq AS DOUBLE) / {_ATK_GRID}) / n)"
                    " / (CAST(t AS DOUBLE) / n)"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("atkinson_eps1"),
    )
