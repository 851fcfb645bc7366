"""Analytic window functions (SURVEY §2.5 generic surface): ranking, lag,
running totals, frames, argmax-per-group. Every ORDER BY inside a window
includes a unique key so results are total-ordered and deterministic.

Scale note: window partitions shuffle on partitionBy keys; high-cardinality
keys (customer, user) partition well. A window with no PARTITION BY is a
single-task global sort — avoided here except where semantically required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table


@query(
    "window_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(o_totalprice - lag(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("running_total"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_prev"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
    FROM orders
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("mov_avg3"),
    )


@query(
    "window_argmax_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def window_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group (the reference's iloc[0] identity pick generalized to
    a deterministic argmax — SURVEY §2.4 A3 / §7 'per-file identity')."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").alias("top_price"),
        )
    )


@query(
    "window_ntile_lead",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS bal_quartile,
           lead(c_custkey) OVER (ORDER BY c_acctbal DESC, c_custkey) AS next_custkey
    FROM customer
    """,
)
def window_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.lead("c_custkey").over(w).alias("next_custkey"),
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the grouped-top-N shape (distinct from
    the single-row argmax, which a plain MAX-over-struct serves cheaper).

    One shuffle on the (high-cardinality) group key; Spark pushes the
    rn <= 3 bound into the sort as a group-limit (WindowGroupLimit), so a
    customer with 10k orders keeps only 3 rows past its sort instead of
    ranking everything. Tie-broken by orderkey: total order, both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
                      RANGE BETWEEN 1800000000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling_30m_sum
    FROM events
    WHERE user_id <= 20
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame: per user, the sum of `value` over the trailing 30
    minutes — a VALUE-based frame (all rows within 1800 s), not a row
    count. This is the sliding-aggregate shape rows-frames cannot express
    when event spacing is irregular.

    ts is int64 nanoseconds, so the frame bound is integer arithmetic on
    both engines; the frame sum accumulates in DECIMAL (frames re-add
    values in engine order — exact arithmetic keeps both engines
    identical). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-1800 * 1_000_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_30m_sum"),
    )


@query(
    "window_percent_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           round(percent_rank() OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey), 6)
               AS bal_pct_rank,
           round(cume_dist() OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey), 6)
               AS bal_cume_dist
    FROM supplier
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rank/n) — exact small-integer ratios, so the doubles are
    identical on both engines. The unique s_suppkey tie-break makes ranks
    themselves deterministic. One shuffle on the partition key."""
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )
