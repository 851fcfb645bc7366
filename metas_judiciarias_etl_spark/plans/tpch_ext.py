"""Remaining structurally-distinct TPC-H query shapes for the generic engine
surface (SURVEY §2.3 note: the reference has no fact-fact joins, so the
engine's generic join/agg breadth is demonstrated on the TPC-H-ish fixtures).

Each query here adds a plan shape not covered by the earlier q1-q18 set:

* q7  — double-aliased dimension join (same dim table joined twice under
  different roles) + disjunctive pair filter + year bucketing.
* q9  — multi-fact join with expression profit and two-level group keys.
* q13 — LEFT OUTER join with a filtered right side, then a distribution
  (aggregate-of-an-aggregate: orders-per-customer → customers-per-count).
* q15 — argmax over a derived aggregate (revenue view + global max).
* q16 — count(DISTINCT) after an ANTI join exclusion list.
* q17 — correlated per-group average threshold (broadcast per-part avg).
* q21 — EXISTS ∧ NOT-EXISTS composition (semi join then anti join).
* q22 — uncorrelated scalar subquery threshold + anti join + substring-ish
  derived grouping key.
* q8  — conditional-share two-level aggregation (numerator = CASE-gated sum
  over the same rows as the denominator) across a 7-relation join.
* q11 — GROUP BY + HAVING against an aggregate-of-aggregates scalar,
  made division-free (n·vᵢ > Σv) so the threshold compare is
  decimal-exact on both engines. (The fixture set has no partsupp
  table, so supplier "value" is lineitem revenue — same plan shape.)
* q19 — disjunction of conjunct groups (brand × size × quantity bands)
  as the join predicate: OR-of-ANDs pushdown + one decimal sum.
* q20 — correlated dominance threshold down a semi-join chain: per
  (supplier, part) share vs half the part total, suppliers having ≥1
  dominant part (partsupp-less adaptation of availqty > ½·shipped).

Scale notes (100 TB):
* Money sums run in DECIMAL(18,6) and round BEFORE the cast to double —
  double summation is order-dependent across partitions, decimal is exact.
* Dimension sides (nation, per-part/per-nation aggregates) are broadcast:
  one shuffle-free hash join per probe. Fact-fact joins (lineitem-orders)
  stay shuffle joins on the join key and AQE picks the strategy at runtime.
* q13's two aggregations shuffle on different keys (custkey, then count) —
  unavoidable, but the second input is one row per customer, ~1e-3 of the
  fact side.
* q17's per-part average is computed once on the filtered part subset and
  broadcast back — the correlated-subquery rewrite that avoids a per-row
  subplan. The threshold compare is integer-exact (qty*5*cnt < sum) so no
  float boundary flicker between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table

_DEC = "decimal(18,6)"


def _rev() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)


# --------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between two nations, by direction and year.
# --------------------------------------------------------------------------
@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same nation dim joins twice under two roles (supplier's and
    customer's); both are broadcast, so only the lineitem-orders fact join
    shuffles. The pair filter lands after both lookups — Catalyst still
    pushes the two single-nation IN-filters into each broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year. The fixture has no
# partsupp, so supply cost is proxied by 10% of the part's retail price.
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.1 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, ship_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part is filtered by the LIKE before the join (predicate pushdown into
    the broadcast build side), so the fact probe discards non-matching rows
    at the hash lookup instead of after a full join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution via LEFT OUTER join.
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-of-an-aggregate: orders-per-customer, then customers-per-
    count. The join filter lives in the ON clause (NOT a post-filter — that
    would turn the outer join inner and drop zero-order customers). Second
    shuffle input is one row per customer."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by quarterly revenue — argmax over a
# derived aggregate (the reference's "view + max" formulation).
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view is computed once and reused for both the argmax probe
    and the scalar max (Spark reuses the exchange; the max side is one row,
    joined as a broadcast cross filter). Ties keep every top supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx._mx)
        .join(F.broadcast(sup), F.col("suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape: supplier count per part descriptor, minus an exclusion
# list (NOT IN → ANTI join), with count(DISTINCT) after the join.
# --------------------------------------------------------------------------
@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exclusion list (suppliers in arrears) is tiny → broadcast ANTI
    join, zero extra shuffles. count(DISTINCT) expands to a two-phase
    de-dup + count handled by Catalyst's distinct-aggregate rewrite.
    (The fixture has no partsupp; lineitem is the part-supplier relation,
    and s_suppkey is never NULL so NOT IN ≡ anti-join here.)"""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape: revenue of small-quantity orders — a correlated per-part
# average threshold, rewritten as a broadcast join against the per-part agg.
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7,
                2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND p.p_size < 5
      AND l.l_quantity * 5 * (SELECT count(*) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
          < (SELECT sum(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qty < 0.2 * avg(qty per part), expressed integer-exactly as
    qty*5*cnt < sum so both engines decide the boundary identically
    (quantities are integral; double sums of small ints are exact).
    The per-part (sum, cnt) aggregate is restricted to the filtered parts
    before it is computed, then broadcast back onto the probe."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 5)
    )
    li = load_table(spark, sf_dir, "lineitem")
    li_branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li_branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("_sum_qty"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    return (
        li_branded.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") * 5 * F.col("_cnt") < F.col("_sum_qty"))
        .agg(
            (F.round(F.sum(F.col("l_extendedprice").cast(_DEC)) / 7, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape: EXISTS ∧ NOT EXISTS — customers holding a finished order
# but no open order, counted per nation.
# --------------------------------------------------------------------------
@query(
    "q21_strict_customers",
    oracle="""
    SELECT n.n_name, count(*) AS numcust
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY n.n_name
    """,
)
def q21_strict_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join then anti join on the same fact under different filters —
    each is a one-sided existence probe, no row multiplication anywhere.
    Both probe sides reduce to distinct custkeys before the join at scale
    (Catalyst inserts the aggregate for semi/anti automatically)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("_oc")
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(finished, cust.c_custkey == finished.o_custkey, "left_semi")
        .join(open_, F.col("c_custkey") == F.col("_oc"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"))
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: rich idle customers — uncorrelated scalar-subquery
# threshold, anti join against orders, derived grouping key.
# --------------------------------------------------------------------------
@query(
    "q22_idle_balance",
    oracle="""
    SELECT CAST(c.c_nationkey % 10 AS INT) AS cntrycode,
           count(*) AS numcust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY cntrycode
    """,
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global average is one row → broadcast cross-join filter (no
    driver-side collect, stays one job). The no-orders test is an anti join
    whose build side is distinct custkeys. The avg threshold compares
    strictly (>) against values that are never exactly the double avg of a
    large sample, so engine-order FP drift cannot flip a row."""
    cust = load_table(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_thr")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(thr), F.col("c_acctbal") > F.col("_thr"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — conditional numerator over the
# same rows as the denominator, across a 7-relation join.
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
    WITH base AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6)) AS rev,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN region r   ON nc.n_regionkey = r.r_regionkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_5'
                                        THEN rev END), 0) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
    FROM base
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of PROMO-part revenue sold into ASIA, per year.

    Both sums run over the identical row set (the CASE gates the
    numerator), so one aggregation produces share — no self-join. Both
    accumulate in DECIMAL (exact, order-independent) and only the final
    ratio is double. Every dimension (nation x2, region, part, supplier,
    customer is the largest at ~1/10 of orders) broadcasts; lineitem⋈orders
    is the single shuffle join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == region.r_regionkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _rev().alias("rev"),
            "supp_nation",
        )
    )
    num = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("rev"))),
        F.lit(0).cast(_DEC),
    )
    return base.groupBy("o_year").agg(
        F.round(num.cast("double") / F.sum("rev").cast("double"), 6).alias(
            "mkt_share"
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape: HAVING against an aggregate-of-aggregates scalar.
# --------------------------------------------------------------------------
@query(
    "q11_important_suppliers",
    oracle="""
    WITH per AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                   AS val
        FROM lineitem GROUP BY l_suppkey
    ), tot AS (
        SELECT sum(val) AS total, count(*) AS n FROM per
    )
    SELECT per.l_suppkey AS suppkey,
           CAST(round(per.val, 2) AS DOUBLE) AS total_value
    FROM per, tot
    WHERE per.val * tot.n > tot.total
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose revenue exceeds the per-supplier average — the q11
    HAVING-vs-scalar-threshold shape. (No partsupp table in the fixture
    set; lineitem revenue stands in for stock value, identical plan.)

    The threshold compare is DIVISION-FREE: v_i·n > Σv keeps everything in
    exact decimal/integer arithmetic, so no engine can flip a borderline
    row through avg() rounding. The scalar (Σv, n) is one row, broadcast
    back over the per-supplier aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("val"))
    tot = per.agg(
        F.sum("val").alias("total"), F.count(F.lit(1)).alias("n")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * F.col("n") > F.col("total"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.round("val", 2).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunct groups as the join predicate.
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 5 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 50
           AND l.l_quantity BETWEEN 10 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs join predicate (brand × size × quantity bands).

    Catalyst factors the part-only conjuncts (brand, size) into a pushed
    scan filter on the broadcast side and leaves the mixed residual on the
    join — the disjunction never degrades to a cartesian product. The
    quantity bounds prune lineitem row-groups via min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bands = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(5, 25)
           & F.col("l_quantity").between(5, 30))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(10, 50)
           & F.col("l_quantity").between(10, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bands)
        .agg(
            F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: dominance threshold down a semi-join chain.
# --------------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
    ), pair AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS pair_qty
        FROM lineitem l
        JOIN red_parts rp ON rp.p_partkey = l.l_partkey
        GROUP BY l.l_suppkey, l.l_partkey
    ), tot AS (
        SELECT l_partkey, sum(pair_qty) AS part_qty
        FROM pair GROUP BY l_partkey
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           count(*) AS n_dominant_parts
    FROM pair
    JOIN tot USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = pair.l_suppkey
    WHERE pair.pair_qty * 2 > tot.part_qty
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping >half of some red part's total quantity — the
    q20 correlated-threshold-down-a-join-chain shape (availqty > ½·shipped
    reworked over lineitem; no partsupp in the fixture set).

    The per-part total re-aggregates the (supplier, part) partials —
    second agg input is already collapsed, ~|parts| rows — and joins back
    on partkey. The dominance compare is 2·pair > total: quantities are
    integral doubles (exact well past any real count), doubling stays
    exact, no division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    tot = pair.groupBy("l_partkey").agg(F.sum("pair_qty").alias("part_qty"))
    return (
        pair.join(tot, "l_partkey")
        .filter(F.col("pair_qty") * 2 > F.col("part_qty"))
        .join(F.broadcast(supp), pair.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
        )
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )
