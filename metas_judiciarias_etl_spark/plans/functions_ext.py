"""Extended function surface: arrays/lateral explode, JSON→map access,
pivot/unpivot, statistical aggregates, deterministic argmax via struct
ordering, date arithmetic, hash-bucket sampling, scalar subqueries, and
approximate distinct counting. All Catalyst built-ins with DuckDB twins
(except approx_count_distinct, whose sketch is engine-specific → rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import sql_hash48
from ..registry import query
from ..sources.parquet import load_table


@query(
    "arrays_explode_lateral",
    oracle="""
    WITH w AS (
        SELECT p_partkey, regexp_split_to_array(trim(p_name), '\\s+') AS words
        FROM part WHERE p_partkey <= 200
    ), ex AS (
        SELECT p_partkey,
               unnest(list_transform(generate_series(1, len(words)),
                      __i -> struct_pack(pos := __i - 1, word := words[__i]))) AS s
        FROM w
    )
    SELECT p_partkey, CAST(s.pos AS INTEGER) AS pos, s.word AS word FROM ex
    """,
)
def arrays_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with position — the row-expanding array op (stays in
    its partition; no shuffle)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.trim(F.col("p_name")), r"\s+")).alias("pos", "word"),
    )


@query(
    "array_agg_sorted",
    oracle="""
    SELECT s_nationkey,
           array_to_string(list_sort(array_agg(s_name)), '|') AS supplier_names,
           count(*) AS n_suppliers
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped array aggregation — sort_array makes the result deterministic
    (collect_list order is partition-dependent otherwise); the array is then
    joined to one delimited string so every output column is a scalar."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.groupBy("s_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
            "supplier_names"
        ),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


@query(
    "json_map_access",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_val,
           json_extract_string(props, '$.missing_key') AS missing_val
    FROM events
    WHERE event_id <= 500
    """,
)
def json_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: parse the JSON props column into a map and
    read keys (map_* surface over real data; absent key → NULL)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "missing_key").alias("missing_val"),
    )


@query(
    "pivot_status_totals",
    oracle="""
    SELECT o_orderpriority,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS st_o,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS st_f,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS st_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (explicit values keep it one pass — no
    extra distinct-scan job to discover columns)."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        *[
            F.round(F.coalesce(F.col(s), F.lit(0.0)), 2).alias(f"st_{s.lower()}")
            for s in ("O", "F", "P")
        ],
    )


@query(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val
    FROM part
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) — the inverse reshaping op."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.col("p_size").cast("double"), "p_retailprice"
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


@query(
    "stats_aggs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 8)     AS cov_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (all partial-aggregatable — one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("cov_disc_tax"),
    )


@query(
    "argmax_struct",
    oracle="""
    SELECT o_custkey,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).p AS top_price,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
)
def argmax_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmax WITHOUT a window: max over a (value, tiebreak)
    struct under lexicographic ordering — a plain partial-aggregatable MAX,
    cheaper than row_number at 100 TB (no per-group sort)."""
    orders = load_table(spark, sf_dir, "orders")
    top = F.max(F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")))
    return orders.groupBy("o_custkey").agg(
        top.getField("p").alias("top_price"), top.getField("k").alias("top_orderkey")
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS due_date,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@query(
    "sample_hash_bucket",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE {sql_hash48("CAST(o_orderkey AS VARCHAR)")} % 10 = 0
    """,
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via content hashing — unlike rand()-based
    sampling this is reproducible across engines, runs, and partitionings
    (the right way to carve eval splits from a 100 TB corpus)."""
    from ..functions.hashing import hash48

    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        hash48(F.col("o_orderkey").cast("string")) % 10 == 0
    ).select("o_orderkey", "o_totalprice")


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a computed scalar: a broadcast of the 1-row aggregate
    against the probe side (Catalyst plans the cross-join as broadcast —
    zero shuffle on the fact table)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("__avg"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
                <= 0.05 * count(DISTINCT l_partkey) AS INT) AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): the raw sketch estimate is
    engine-specific, so the checkable contract is a bounded-error assertion:
    each engine computes ITS OWN approximate count and asserts it lands
    within 5% of the exact count (rsd=0.02 → 5% is a 2.5-sigma bound).
    Both engines then agree exactly on (group, exact_count, 1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            )
            .cast("int")
            .alias("within_5pct"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic mode: most frequent value per group with a total tie-break.
# --------------------------------------------------------------------------
@query(
    "mode_agg",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_quantity, count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_quantity
    QUALIFY row_number() OVER (
        PARTITION BY l_returnflag ORDER BY count(*) DESC, l_quantity ASC
    ) = 1
    """,
)
def mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent quantity per return flag. Engine-native ``mode()`` is
    tie-ambiguous, so the contract is count-desc / value-asc — two
    partial-aggregatable shuffles (value histogram, then a 3-group top-1
    WindowGroupLimit), never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n_rows").desc(), F.col("l_quantity").asc()
    )
    return (
        hist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "l_returnflag", F.col("l_quantity").alias("mode_quantity"), "n_rows"
        )
    )


# --------------------------------------------------------------------------
# Shannon entropy via an ORDERED float fold — deterministic accumulation.
# --------------------------------------------------------------------------
@query(
    "entropy_fold",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ), l AS (
        SELECT user_id,
               list_sort(list(struct_pack(event_type := event_type,
                                          cnt := cnt))) AS lst,
               sum(cnt) AS n_events
        FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           round(list_reduce(
                     [0.0] || list_transform(
                         lst, x -> -(x.cnt / n_events) * ln(x.cnt / n_events)),
                     (a, b) -> a + b), 6) + 0.0 AS entropy
    FROM l
    """,
)
def entropy_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix. Float addition is not
    associative, so a hash-agg ``sum()`` of the -p*ln(p) terms would be
    partition-order-dependent; instead the terms are folded in SORTED
    struct order with a 0.0 seed — bit-identical accumulation on both
    engines (`+ 0.0` canonicalizes the -0.0 a single-type user produces).
    The collect_list is bounded by event-type cardinality (5), not rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_user = counts.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "cnt"))).alias("lst"),
        F.sum("cnt").alias("n_events"),
    )
    return per_user.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        (
            F.round(
                F.expr(
                    "aggregate(transform(lst,"
                    " x -> -(x.cnt / n_events) * ln(x.cnt / n_events)),"
                    " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("entropy"),
    )


# --------------------------------------------------------------------------
# Pearson correlation from exact integer moments.
# --------------------------------------------------------------------------
@query(
    "corr_exact",
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
               CAST(round(l_quantity * 100) AS BIGINT) AS y
        FROM lineitem
    ), m AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy,
               CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy
        FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, n AS n_rows,
           (n * sxy - sx * sy)
               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
               AS price_qty_corr
    FROM m
    """,
)
def corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr(price, quantity) per flag. Engine-native ``corr()``
    accumulates doubles in partition order (non-reproducible); here all
    five moments are EXACT DECIMAL sums of integer cents, cast to double
    once, and the closed form is the identical IEEE expression on both
    engines. One partial-aggregatable shuffle on a 3-value key."""
    c = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("x"),
        F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("y"),
    )
    m = c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").alias("syy"),
        F.expr("CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE)").alias("sxy"),
    )
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.expr(
            "(n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))"
        ).alias("price_qty_corr"),
    )


# --------------------------------------------------------------------------
# Null-preserving lateral: explode_outer keeps rows with no matches.
# --------------------------------------------------------------------------
@query(
    "explode_outer_lateral",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), __t -> len(__t) >= 12)
                   AS longs
        FROM documents
    )
    SELECT doc_id,
           unnest(CASE WHEN longs IS NULL OR len(longs) = 0
                       THEN [NULL] ELSE longs END) AS long_token
    FROM toks
    """,
)
def explode_outer_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a possibly-empty match list: documents with no
    long token survive with NULL instead of vanishing — the LEFT-JOIN-
    lateral semantics an inner explode silently breaks. Map-only."""
    docs = load_table(spark, sf_dir, "documents")
    longs = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) >= 12)
    return docs.select(
        "doc_id", F.explode_outer(longs).alias("long_token")
    )


# --------------------------------------------------------------------------
# regexp_extract_all: every match, not just the first.
# --------------------------------------------------------------------------
@query(
    "regex_extract_all",
    oracle="""
    SELECT p_partkey,
           coalesce(array_to_string(regexp_extract_all(p_name, 's[a-z]+'),
                                    '|'), '') AS s_words,
           CAST(len(regexp_extract_all(p_name, 's[a-z]+')) AS INTEGER)
               AS n_matches
    FROM part
    WHERE p_partkey <= 2000
    """,
)
def regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All regex matches per row (joined to one scalar so the driver can
    hash it). Scan-stage expression — regex never forces a shuffle or a
    Python worker."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    matches = F.expr("regexp_extract_all(p_name, 's[a-z]+', 0)")
    return part.select(
        "p_partkey",
        F.array_join(matches, "|").alias("s_words"),
        F.size(matches).alias("n_matches"),
    )


# --------------------------------------------------------------------------
# Per-key approximate percentiles: the mergeable-sketch path the exact
# percentile operators document for unbounded key counts, registered with
# its own checkable contract.
# --------------------------------------------------------------------------
@query(
    "approx_percentile_by_key",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           round(quantile_cont(cents, 0.5) / 100.0, 6) AS exact_p50,
           CAST(approx_quantile(cents, 0.5)
                    BETWEEN quantile_cont(cents, 0.40)
                        AND quantile_cont(cents, 0.60) AS INT)
               AS within_rank_bound
    FROM c
    GROUP BY user_id
    """,
)
def approx_percentile_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median via the mergeable t-digest sketch — the scale path
    percentile_agg/mad_robust_outliers document for UNBOUNDED key counts
    (exact percentile holds a group's values in memory; a sketch holds a
    constant-size summary and merges map-side). Raw sketch output is
    engine-specific, so the checkable contract mirrors
    approx_distinct_sketch: each engine asserts ITS OWN approximate
    median lands within the exact 40th-60th-percentile rank band, and
    both engines agree exactly on (user, count, exact median, 1).
    Values quantize to integer cents so the exact interpolated medians
    are identical doubles on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.percentile("cents", F.lit(0.5)).alias("__p50"),
            F.percentile("cents", F.lit(0.40)).alias("__p40"),
            F.percentile("cents", F.lit(0.60)).alias("__p60"),
            F.percentile_approx("cents", F.lit(0.5), F.lit(10000)).alias("__ap"),
        )
        .select(
            "user_id",
            "n_events",
            F.round(F.col("__p50") / 100.0, 6).alias("exact_p50"),
            F.col("__ap")
            .between(F.col("__p40"), F.col("__p60"))
            .cast("int")
            .alias("within_rank_bound"),
        )
    )


@query(
    "variant_typed_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(count(json_extract(props, '$.missing')) AS BIGINT)
               AS n_missing_present
    FROM events
    GROUP BY event_type
    """,
)
def variant_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access on the Spark 4 VARIANT path: ``parse_json``
    decodes the props column ONCE into the binary variant encoding, and
    every field access is a typed ``variant_get`` — no per-access string
    re-parse (the 100 TB difference vs get_json_object, which re-parses
    the JSON text for every extracted field; with shredded variant
    storage the extraction pushes into the scan). Missing paths surface
    as NULL through ``try_variant_get`` — the same absent-key contract as
    json_map_access. Per-type rollup of the typed integers keeps the
    result engine-checkable against DuckDB's native JSON extraction.

    Plan shape: scan-stage parse + typed projections, one
    partial-aggregatable rollup on the handful of event types."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "bigint")
    return ev.select(
        "event_type", k.alias("k"), missing.alias("m")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.count("m").cast("long").alias("n_missing_present"),
    )


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between two cohorts' event-type distributions —
# the symmetric, bounded (<= ln 2) counterpart to PSI for A/B mix checks.
# --------------------------------------------------------------------------
@query(
    "dist_js_divergence",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ca,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS cb
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               CAST(count(*) AS BIGINT) AS n_types,
               list_sort(list(struct_pack(event_type := event_type,
                                          ca := ca, cb := cb))) AS lst
        FROM c
    )
    SELECT n_a, n_b, n_types,
           round(list_reduce([0.0] || list_transform(lst, x ->
               (CASE WHEN x.ca > 0 THEN 0.5 * (x.ca / n_a)
                    * ln(2 * (x.ca / n_a) / ((x.ca / n_a) + (x.cb / n_b)))
                    ELSE 0.0 END)
             + (CASE WHEN x.cb > 0 THEN 0.5 * (x.cb / n_b)
                    * ln(2 * (x.cb / n_b) / ((x.ca / n_a) + (x.cb / n_b)))
                    ELSE 0.0 END)),
               (a, b) -> a + b), 6) + 0.0 AS jsd
    FROM tot
    """,
)
def dist_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the event-type distributions of
    the even- and odd-user cohorts (a deterministic hash split standing in
    for any A/B or before/after pair): jsd = 0.5*KL(p||m) + 0.5*KL(q||m)
    with m = (p+q)/2, each term written as 0.5*p*ln(2p/(p+q)) with the
    0*ln(0) = 0 convention — symmetric and bounded by ln 2, which makes it
    the mix-shift number to alert on when PSI's reference side is itself
    moving.

    Determinism: cohort counts are exact integers from ONE conditional
    aggregation; shares are integer-ratio divisions (identically rounded
    both engines); the fold runs in sorted event-type order over a
    type-cardinality-bounded list (entropy_fold discipline).

    Plan: one event_type-keyed pass with two conditional partial sums —
    no join between cohorts, no second scan; the fold runs on a 1-row
    relation."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sort_array(F.collect_list(F.struct("event_type", "ca", "cb"))).alias(
            "lst"
        ),
    )
    fold = (
        "aggregate(transform(lst, x -> "
        "(CASE WHEN x.ca > 0 THEN 0.5 * (x.ca / n_a)"
        "     * ln(2 * (x.ca / n_a) / ((x.ca / n_a) + (x.cb / n_b)))"
        "     ELSE 0.0 END)"
        " + (CASE WHEN x.cb > 0 THEN 0.5 * (x.cb / n_b)"
        "     * ln(2 * (x.cb / n_b) / ((x.ca / n_a) + (x.cb / n_b)))"
        "     ELSE 0.0 END)), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return tot.select(
        "n_a",
        "n_b",
        "n_types",
        (F.round(F.expr(fold), 6) + F.lit(0.0)).alias("jsd"),
    )
