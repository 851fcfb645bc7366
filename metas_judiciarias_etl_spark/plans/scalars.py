"""Scalar-function surface (SURVEY §2.7): arithmetic, rounding parity,
coercion, the 'NA' sentinel stringification, string and date functions.
All pure Catalyst expressions — whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.kernels import na_stringify
from ..registry import query
from ..sources.parquet import load_table


@query(
    "c2_bround_bankers",
    oracle="""
    SELECT DISTINCT l_quantity,
           round_even(l_quantity / 8.0, 2) AS q8_bankers,
           round_even(l_quantity / 16.0, 2) AS q16_bankers
    FROM lineitem
    """,
)
def c2_bround_bankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banker's-rounding parity probe (Versao_Np.py:79 round(x,2) is
    HALF_EVEN). l_quantity/8 lands on exact binary .125 steps, so ties are
    real: bround(0.125,2)=0.12, while HALF_UP round would give 0.13."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_quantity",
        F.bround(F.col("l_quantity") / 8.0, 2).alias("q8_bankers"),
        F.bround(F.col("l_quantity") / 16.0, 2).alias("q16_bankers"),
    ).distinct()


@query(
    "c4_na_sentinel",
    oracle="""
    SELECT l_returnflag,
           coalesce(CAST(round_even(sum(l_extendedprice)
                         / nullif(sum(l_quantity) - sum(l_discount), 0) * 100, 2)
                         AS VARCHAR), 'NA') AS meta_str,
           coalesce(CAST(round_even(sum(l_extendedprice)
                         / nullif(sum(l_quantity) - sum(l_quantity), 0) * 100, 2)
                         AS VARCHAR), 'NA') AS meta_zero_den_str
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def c4_na_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink-side stringification with the 'NA' sentinel (NP:232
    astype(str).replace('nan','NA')); the second column forces a zero
    denominator so the sentinel path is exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    ok = F.bround(
        F.sum("l_extendedprice")
        / F.nullif(F.sum("l_quantity") - F.sum("l_discount"), F.lit(0))
        * 100,
        2,
    )
    zero_den = F.bround(
        F.sum("l_extendedprice")
        / F.nullif(F.sum("l_quantity") - F.sum("l_quantity"), F.lit(0))
        * 100,
        2,
    )
    return li.groupBy("l_returnflag").agg(
        na_stringify(ok).alias("meta_str"),
        na_stringify(zero_den).alias("meta_zero_den_str"),
    )


@query(
    "c5_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                          AS type_upper,
           substr(p_name, 1, 8)                   AS name8,
           CAST(length(p_name) AS INTEGER)        AS name_len,
           replace(p_brand, 'Brand#', 'B')        AS brand_short,
           concat_ws('|', p_brand, p_type)        AS brand_type,
           ltrim(rtrim(lower(p_name)))            AS name_norm
    FROM part
    """,
)
def c5_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.lower(F.col("p_name"))).alias("name_norm"),
    )


@query(
    "c6_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)    AS y,
           CAST(month(o_orderdate) AS INTEGER)   AS m,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           count(*)                              AS n_orders,
           round(sum(o_totalprice), 2)           AS sum_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def c6_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.quarter("o_orderdate").alias("q"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "c1_arithmetic_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_extendedprice / nullif(l_quantity, 0)          AS unit_price,
           CAST(l_quantity AS BIGINT) % 7                   AS qty_mod7,
           abs(l_discount - l_tax)                          AS disc_tax_gap
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
)
def c1_arithmetic_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic stays unrounded: IEEE-754 double ops evaluated in
    the same textual order are bit-exact across engines (rounding per-row
    2-dp-derived values actually *introduces* half-boundary divergence)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        (F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0))).alias(
            "unit_price"
        ),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
    )
