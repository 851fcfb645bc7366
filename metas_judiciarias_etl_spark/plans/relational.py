"""Core relational surface: scans, filters, joins, aggregations, set ops.

Each query mirrors an operator family from SURVEY.md §2 (citations inline),
re-expressed on the driver's TPC-H-ish fixtures so the DuckDB oracle can
verify it. All computed doubles are rounded (2 dp for money-like sums, 6 dp
for averages/ratios) so the order-insensitive value-hash is stable across
engines; counts are cast to bigint on both sides (DuckDB sum(int) widens to
hugeint otherwise).

Scale notes (100 TB):
* Aggregations here are single-shuffle hash aggregates with map-side partial
  combine — the shape Catalyst picks for groupBy().agg(); skew handled by AQE.
* Small dimensions (region: 5 rows, nation: 25) are explicitly broadcast —
  no shuffle on the fact side.
* The big fact-fact join (orders ⋈ lineitem) shuffles on the join key; at
  scale both sides would be bucketed by orderkey to make it shuffle-free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table


# --------------------------------------------------------------------------
# A1/A4: grouped columnar sums — the reference's central operator shape
# (Versao_Np.py:70,74,179-185: ~49 per-file column sums) as one hash agg.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter → single-shuffle hash agg (partial+final)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# A4: the guarded ratio-metric kernel (calcular_meta, Versao_Np.py:65-81):
# existence guard (count>0), zero-denominator -> NULL, banker's rounding.
# --------------------------------------------------------------------------
@query(
    "a4_guarded_ratio_kernel",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN count(l_extendedprice) > 0
                THEN round_even(sum(l_extendedprice)
                                / nullif(sum(l_quantity) - sum(l_discount), 0) * 100, 2)
           END AS meta_ratio,
           CAST(count(l_extendedprice) AS BIGINT) AS n_num
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a4_guarded_ratio_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded ratio: bround(Σnum / nullif(Σden1 - Σden2, 0) × factor, 2).

    Reproduces calcular_meta (NP:65-81): the count(col)>0 aggregate stands in
    for pandas' notna().any() existence probe; nullif keeps ANSI division
    from raising on a zero denominator; negative denominators pass through.
    """
    li = load_table(spark, sf_dir, "lineitem")
    num = F.sum("l_extendedprice")
    den = F.nullif(F.sum("l_quantity") - F.sum("l_discount"), F.lit(0))
    return li.groupBy("l_returnflag").agg(
        F.when(F.count("l_extendedprice") > 0, F.bround(num / den * 100, 2)).alias(
            "meta_ratio"
        ),
        F.count("l_extendedprice").cast("long").alias("n_num"),
    )


# --------------------------------------------------------------------------
# A5: meta-1 kernel — 4-term denominator with an optional term defaulting
# to 0 (Versao_Np.py:171-208: Σjulg/(Σcn + Σdess − Σsusp) × 100).
# --------------------------------------------------------------------------
@query(
    "a5_meta1_kernel",
    oracle="""
    SELECT l_linestatus,
           round_even(sum(l_extendedprice)
                      / nullif(sum(l_quantity) + coalesce(sum(l_tax), 0) - sum(l_discount), 0)
                      * 100, 2) AS meta1
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def a5_meta1_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    den = (
        F.sum("l_quantity")
        + F.coalesce(F.sum("l_tax"), F.lit(0.0))
        - F.sum("l_discount")
    )
    return li.groupBy("l_linestatus").agg(
        F.bround(F.sum("l_extendedprice") / F.nullif(den, F.lit(0)) * 100, 2).alias(
            "meta1"
        )
    )


# --------------------------------------------------------------------------
# A7: conditional metric suppression — the STJ override (Versao_Np.py:125-135):
# when the special metric computes, the standard ones are nulled on that row.
# --------------------------------------------------------------------------
@query(
    "a7_conditional_suppression",
    oracle="""
    SELECT n.n_name,
           CASE WHEN n.n_name <> 'BRAZIL'
                THEN round(sum(s.s_acctbal), 2) END AS bal_standard,
           CASE WHEN n.n_name = 'BRAZIL'
                THEN round(sum(s.s_acctbal), 2) END AS bal_special
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def a7_conditional_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    total = F.round(F.sum("s_acctbal"), 2)
    is_special = F.col("n_name") == "BRAZIL"
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.when(~is_special, total).alias("bal_standard"),
            F.when(is_special, total).alias("bal_special"),
        )
    )


# --------------------------------------------------------------------------
# J1+J2: dimension lookup join with special-case key remap and per-key
# fallback (obter_fatores_por_ramo, Versao_Np.py:10-30 + NP:122's
# get(k, je.get(k))): broadcast hash join + CASE remap + COALESCE default.
# --------------------------------------------------------------------------
@query(
    "j1_dim_lookup_fallback",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           coalesce(r.r_name, 'AMERICA') AS region_name
    FROM nation n
    LEFT JOIN region r
      ON r.r_regionkey = (CASE WHEN n.n_name = 'BRAZIL' THEN 99
                               ELSE n.n_regionkey END)
    """,
)
def j1_dim_lookup_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remap key for special rows (→ miss), then COALESCE to the default
    dimension value — the same shape as the reference's branch→factor lookup
    with Justiça-Estadual fallback. Dimension side is broadcast: zero shuffle."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    lookup_key = F.when(F.col("n_name") == "BRAZIL", F.lit(99)).otherwise(
        F.col("n_regionkey")
    )
    return (
        nat.join(F.broadcast(reg), lookup_key == reg.r_regionkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("r_name"), F.lit("AMERICA")).alias("region_name"),
        )
    )


@query(
    "j2_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j2_anti_join",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_acctbal")


# --------------------------------------------------------------------------
# Multi-way joins (generic surface; no fact-fact joins exist in the
# reference — SURVEY §2.3 — so these exercise Spark's builtin join planning).
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim filter → join → agg → deterministic top-k.

    customer is small relative to lineitem → broadcast; orders⋈lineitem is
    the real shuffle (bucket both by orderkey at scale to eliminate it)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join with a region filter that Catalyst
    pushes through the broadcast chain (nation/region/supplier all broadcast;
    only orders⋈lineitem shuffles)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# U1: union-all with schema alignment BY NAME (pd.concat, Versao_Np.py:226)
# — Spark unionByName(allowMissingColumns=True); missing columns -> NULL.
# --------------------------------------------------------------------------
@query(
    "u1_union_by_name",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "u1_union_many_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, c_acctbal AS acctbal,
           'customer' AS src, NULL AS nationkey
    FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS entity_key, s_name AS entity_name, s_acctbal AS acctbal,
           'supplier' AS src, CAST(s_nationkey AS INTEGER) AS nationkey
    FROM supplier
    UNION ALL BY NAME
    SELECT n_nationkey AS entity_key, n_name AS entity_name, 'nation' AS src
    FROM nation
    """,
)
def u1_union_many_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's heterogeneous-schema union (90 drifted court files →
    Consolidado): fold unionByName(allowMissingColumns=True) over inputs."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("src"),
        )
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .select(
            F.col("s_suppkey").alias("entity_key"),
            F.col("s_name").alias("entity_name"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("src"),
            F.col("s_nationkey").alias("nationkey"),
        )
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").cast("long").alias("entity_key"),
            F.col("n_name").alias("entity_name"),
            F.lit("nation").alias("src"),
        )
    )
    return reduce(
        lambda x, y: x.unionByName(y, allowMissingColumns=True), [cust, sup, nat]
    )


# --------------------------------------------------------------------------
# W1 + top-k: global sort (gerar_grafico ranking, Versao_Np.py:90) + limit.
# --------------------------------------------------------------------------
@query(
    "w1_topk_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 25
    """,
)
def w1_topk_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    top-k + driver merge, no global sort shuffle. Exactly what you want at
    100 TB for a chart-style ranking."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_name", "c_acctbal").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    ).limit(25)


# --------------------------------------------------------------------------
# Distinct aggregation & grouping sets (generic surface, SURVEY §2.4 note).
# --------------------------------------------------------------------------
@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS uniq_supp,
           count(DISTINCT l_partkey) AS uniq_part,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("uniq_supp"),
        F.countDistinct("l_partkey").alias("uniq_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(grouping(r.r_name) * 2 + grouping(n.n_name) AS BIGINT) AS grp,
           count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        (F.grouping("r_name") * 2 + F.grouping("n_name"))
        .cast("long")
        .alias("grp"),
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS grp,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
        .cast("long")
        .alias("grp"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Set operations (generic surface, SURVEY §2.6).
# --------------------------------------------------------------------------
@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# F2/F3/S4-shaped filters: null-tolerant predicates and validation filters.
# --------------------------------------------------------------------------
@query(
    "f3_coerce_filter",
    oracle="""
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_valid,
           CAST(sum(TRY_CAST(json_extract_string(e.props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events e
    WHERE TRY_CAST(json_extract_string(e.props, '$.k') AS INTEGER) IS NOT NULL
      AND e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def f3_coerce_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.to_numeric(errors='coerce') + dropna (NP:85-86) → try_cast (null on
    failure under ANSI mode) + isNotNull filter."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_valid"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )
