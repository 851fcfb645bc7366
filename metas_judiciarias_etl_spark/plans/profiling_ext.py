"""Profiling & affinity surface: table-profile (Deequ-style "analyze"),
market-basket pair counts, merged-interval coverage, and event path
trigrams. Engine-surface extensions in the spirit of SURVEY §2.3-§2.5
(the reference pipeline validates required columns and null-guards
aggregates — `Versao_Np.py` guard logic per SURVEY §2.2 F2/F4; a
column-profile operator is the generalized form of that check).

Scale notes (100 TB):
* dq_column_profile: ONE pass over the fact table. The multi-column
  exact `count(distinct ...)` expands each scan row once per profiled
  column (Expand x4) but partial aggregation collapses per-partition
  duplicates map-side before the single shuffle; for truly unbounded
  domains swap `approx_count_distinct` (HLL, constant-size partials) —
  the profile schema is unchanged. The long/stacked output is produced
  AFTER aggregation on a 1-row relation — stack() never touches fact
  rows.
* basket_pair_counts: the pair generator is a self-equi-join on
  l_orderkey — both sides hash-shuffle on the SAME key, so pairs are
  produced without any cross-partition traffic beyond the two co-keyed
  exchanges. Per-basket blowup is O(k^2); MAX_BASKET caps k (mirrored in
  the oracle) so a power-law mega-basket cannot explode a partition —
  the same recall-knob pattern as dedup's BUCKET_CAP. Top-k is a total
  order (count desc, then both keys) -> TakeOrderedAndProject.
* interval_coverage: gaps-and-islands. Every step — the running
  max-end window, the island-id prefix sum, the per-island extent agg,
  and the per-user rollup — keys on user_id, so the single user_id
  exchange is reused end-to-end (hash partitioning on user_id satisfies
  the (user_id, island_id) clustering). All arithmetic is integer
  microseconds: exact under any shuffle layout.
* path_trigrams: two lead() windows over the same (user_id) partition
  spec share one exchange+sort; the trigram count then shuffles on the
  trigram key where Zipf-head skew is absorbed by map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.parquet import load_table

# Numeric lineitem columns profiled by dq_column_profile.
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

# Orders with more than MAX_BASKET distinct parts are excluded from pair
# generation (quadratic-blowup guard; recall knob, mirrored in the oracle).
MAX_BASKET = 8

# Each event covers [ts, ts + 5 min); overlapping covers merge.
_INTERVAL_US = 300_000_000


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               min({c}) AS min_val,
               max({c}) AS max_val
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@query("dq_column_profile", oracle=_profile_oracle())
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style table profile: per-column row/null/distinct counts and
    min/max, computed in ONE aggregate pass and stacked to long form on
    the 1-row result. Generalizes the reference's required-column /
    any-non-null validation (SURVEY §2.2 F2/F4) into a reusable profile
    operator."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_val, max_val)",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def _basket_pairs(parts):
    """All (a, b) part structs of one basket array, expanded in-row — the
    caller filters a < b. Bounded by MAX_BASKET² structs per order."""
    return F.flatten(
        F.transform(
            parts,
            lambda x: F.transform(
                parts, lambda y: F.struct(x.alias("a"), y.alias("b"))
            ),
        )
    )


@query(
    "basket_pair_counts",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (
        SELECT l_orderkey FROM op
        GROUP BY l_orderkey HAVING count(*) <= {MAX_BASKET}
    ),
    p AS (SELECT op.l_orderkey, op.l_partkey FROM op JOIN ok USING (l_orderkey))
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_orders
    FROM p a
    JOIN p b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top co-occurring part pairs across orders.

    Round 8 (guide §2.4): ONE collect_set aggregation builds each order's
    distinct-part basket (replacing distinct + count-filter join-back +
    co-keyed self-join — four exchanges of the fact-grain relation), the
    MAX_BASKET cap filters on array size in-row, and the <= 8² pair
    structs expand inside the row (the _lsh_candidates bucket-expansion
    shape) before the single (part_a, part_b) rollup. Same pair multiset:
    a pair is counted once per qualifying order containing both parts."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
    )
    return (
        baskets.select(F.explode(_basket_pairs(F.col("parts"))).alias("pr"))
        .filter(F.col("pr.a") < F.col("pr.b"))
        .groupBy(
            F.col("pr.a").alias("part_a"), F.col("pr.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "interval_coverage",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s_us,
               epoch_us(ts) + {_INTERVAL_US} AS e_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, s_us, e_us,
               CASE WHEN max(e_us) OVER (
                        PARTITION BY user_id ORDER BY s_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) >= s_us THEN 0 ELSE 1 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, e_us, s_us,
               sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island_id
        FROM flagged
    ),
    extents AS (
        SELECT user_id, island_id,
               min(s_us) AS island_s, max(e_us) AS island_e
        FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(island_e - island_s) AS BIGINT) AS covered_us
    FROM extents GROUP BY user_id
    """,
)
def interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage per user (gaps-and-islands): each event
    covers [ts, ts+5min); overlapping covers merge into islands. Returns
    per-user island count and total covered microseconds. One user_id
    exchange serves the running-max window, the island-id prefix sum,
    and both aggregations."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("s_us"),
        (F.expr("ts div 1000") + F.lit(_INTERVAL_US)).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s_us",
        "e_us",
        F.when(F.max("e_us").over(w_prev) >= F.col("s_us"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    # The prefix sum MUST use the same total order as the flag window:
    # (s_us, event_id). Ordering by s_us alone ties when two events share
    # a timestamp, and a tied prefix-sum order would make island_id (and
    # therefore n_islands) layout-dependent.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    extents = islands.groupBy("user_id", "island_id").agg(
        F.min("s_us").alias("island_s"), F.max("e_us").alias("island_e")
    )
    return extents.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_e") - F.col("island_s")).alias("covered_us"),
    )


@query(
    "path_trigrams",
    oracle="""
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS e2,
               lead(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS e3
        FROM events
    )
    SELECT e1, e2, e3, count(*) AS n_paths
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n_paths DESC, e1, e2, e3
    LIMIT 15
    """,
)
def path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams across per-user event sequences (path
    mining; the 3-step generalization of event_transitions). Both lead()
    windows share one (user_id) exchange+sort; top-k is a total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Association rules: confidence and lift over the capped basket pairs —
# market-basket mining's actual deliverable (the pair counts alone say
# nothing about whether co-occurrence beats chance).
# --------------------------------------------------------------------------
MIN_PAIR_SUPPORT = 2


@query(
    "basket_association_rules",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (
        SELECT l_orderkey FROM op
        GROUP BY l_orderkey HAVING count(*) <= {MAX_BASKET}
    ),
    p AS (SELECT op.l_orderkey, op.l_partkey FROM op JOIN ok USING (l_orderkey)),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM p),
    df AS (SELECT l_partkey, count(*) AS part_orders FROM p GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_pairs
        FROM p a JOIN p b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= {MIN_PAIR_SUPPORT}
    )
    SELECT pr.part_a, pr.part_b,
           CAST(pr.n_pairs AS BIGINT) AS n_pairs,
           pr.n_pairs / CAST(da.part_orders AS DOUBLE) AS confidence_a_to_b,
           pr.n_pairs * CAST(n.n_baskets AS DOUBLE)
               / (CAST(da.part_orders AS DOUBLE) * db.part_orders) AS lift
    FROM pairs pr
    JOIN df da ON da.l_partkey = pr.part_a
    JOIN df db ON db.l_partkey = pr.part_b
    CROSS JOIN n
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the capped baskets: for every part pair
    with support >= {MIN_PAIR_SUPPORT}, confidence(a→b) = P(b|a) and
    lift = P(a,b)/(P(a)P(b)). Lift > 1 means the pair co-occurs beyond
    chance — the signal basket_pair_counts' raw counts can't give.
    Ratios are single IEEE expressions over exact integer counts
    evaluated in the same literal form on both engines.

    Plan shape (round 8, guide §2.4): the basket-pair family's in-row
    expansion — ONE collect_set aggregation builds the capped baskets
    (persisted: the pair expansion, the per-part frequencies and the
    basket count all read it), pairs expand inside the row; the per-part
    document frequencies and the 1-row basket count come back via
    broadcast onto the support-filtered pair list — at 100 TB the pair
    list after the support filter is the only surviving large relation,
    and every enrichment side is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
        .persist()
    )
    baskets.count()  # three consumers: pairs, frequencies, basket count
    n = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    df = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("part_orders"))
    )
    pairs = (
        baskets.select(F.explode(_basket_pairs(F.col("parts"))).alias("pr"))
        .filter(F.col("pr.a") < F.col("pr.b"))
        .groupBy(
            F.col("pr.a").alias("part_a"), F.col("pr.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= MIN_PAIR_SUPPORT)
    )
    da = df.select(F.col("l_partkey").alias("part_a"), F.col("part_orders").alias("df_a"))
    db = df.select(F.col("l_partkey").alias("part_b"), F.col("part_orders").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "part_a")
        .join(F.broadcast(db), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            (F.col("n_pairs") / F.col("df_a").cast("double")).alias(
                "confidence_a_to_b"
            ),
            (
                F.col("n_pairs")
                * F.col("n_baskets").cast("double")
                / (F.col("df_a").cast("double") * F.col("df_b"))
            ).alias("lift"),
        )
    )


basket_association_rules.__doc__ = (
    basket_association_rules.__doc__
    if basket_association_rules.__doc__ is None
    else basket_association_rules.__doc__.replace(
        "{MIN_PAIR_SUPPORT}", str(MIN_PAIR_SUPPORT)
    )
)


# --------------------------------------------------------------------------
# Benford first-digit audit: the classic fabricated-data screen for
# wide-ranging positive amounts.
# --------------------------------------------------------------------------
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def _benford_oracle() -> str:
    expected = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD.items()
    )
    return f"""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ), g AS (
        SELECT digit, count(*) AS n_orders FROM c GROUP BY digit
    ), t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM g)
    SELECT g.digit, g.n_orders,
           round(CAST(g.n_orders AS DOUBLE) / t.total, 6) AS observed_share,
           CAST(CASE g.digit {expected} END AS DOUBLE) AS expected_share,
           round(abs(CAST(g.n_orders AS DOUBLE) / t.total
                     - CAST(CASE g.digit {expected} END AS DOUBLE)), 6)
               AS abs_deviation
    FROM g CROSS JOIN t
    """


@query("dq_benford_first_digit", oracle=_benford_oracle())
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: observed digit
    shares vs log10(1 + 1/d) expectations and their absolute deviation —
    the standard fabricated-or-truncated-amounts screen for any
    wide-ranging positive money column. Digits extract from the INTEGER
    cents rendered as a string (no float log10 near a power-of-ten
    boundary can disagree between engines); expectation constants are
    shared literals.

    Plan shape: scan-stage digit projection, one 9-key aggregation with
    map-side partials, 1-row total broadcast — scan-bound at any scale."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    c = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    g = c.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    t = g.agg(F.sum("n_orders").cast("long").alias("total"))
    expected = F.lit(None).cast("double")
    for d, p in _BENFORD.items():
        expected = F.when(F.col("digit") == d, F.lit(p)).otherwise(expected)
    obs = F.col("n_orders").cast("double") / F.col("total")
    return g.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_orders",
        F.round(obs, 6).alias("observed_share"),
        expected.alias("expected_share"),
        F.round(F.abs(obs - expected), 6).alias("abs_deviation"),
    )


# --------------------------------------------------------------------------
# Join-cardinality estimation: the CBO primitive, checked against the exact
# answer computed WITHOUT materializing the join.
# --------------------------------------------------------------------------
@query(
    "join_cardinality_estimate",
    oracle="""
    WITH g AS (
        SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    ), s AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(cnt * cnt) AS BIGINT) AS exact_selfjoin_rows,
               CAST(max(cnt) AS BIGINT) AS max_key_rows
        FROM g
    )
    SELECT n_rows, n_distinct, exact_selfjoin_rows, max_key_rows,
           round(CAST(n_rows AS DOUBLE) * n_rows / n_distinct, 4)
               AS independence_estimate,
           round(exact_selfjoin_rows
                 / (CAST(n_rows AS DOUBLE) * n_rows / n_distinct), 6)
               AS skew_inflation
    FROM s
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation the way a cost-based optimizer does it —
    |A JOIN B| ~ |A||B| / max(ndv) under uniform-key independence — scored
    against the EXACT self-join cardinality computed without materializing
    the join (sum of per-key count² over one grouped scan). The
    skew_inflation ratio (exact / estimate) is precisely the factor a
    uniform-NDV optimizer under-plans a skewed join by; >1 means AQE skew
    handling or salting is load-bearing, and the max-key row count names
    the key to salt.

    Plan shape: ONE partial-aggregatable shuffle on the join key, then a
    1-row rollup — the estimator costs one scan regardless of how large
    the estimated join would be (that's the point)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    s = g.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias(
            "exact_selfjoin_rows"
        ),
        F.max("cnt").cast("long").alias("max_key_rows"),
    )
    est = F.col("n_rows").cast("double") * F.col("n_rows") / F.col("n_distinct")
    return s.select(
        "n_rows",
        "n_distinct",
        "exact_selfjoin_rows",
        "max_key_rows",
        F.round(est, 4).alias("independence_estimate"),
        F.round(F.col("exact_selfjoin_rows") / est, 6).alias("skew_inflation"),
    )


# --------------------------------------------------------------------------
# Partitioned HLL sketch build + union-merge: the mergeable-state pattern
# that makes distinct counting a map-side problem at 100 TB.
# --------------------------------------------------------------------------
_HLL_TOL = 0.05


@query(
    "hll_partitioned_merge",
    oracle=f"""
    WITH per AS (
        SELECT event_type AS segment,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(abs(approx_count_distinct(user_id)
                        - count(DISTINCT user_id))
                    <= {_HLL_TOL} * count(DISTINCT user_id) AS INT)
                   AS estimate_ok
        FROM events GROUP BY event_type
    ), allrow AS (
        SELECT 'ALL' AS segment,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(abs(approx_count_distinct(user_id)
                        - count(DISTINCT user_id))
                    <= {_HLL_TOL} * count(DISTINCT user_id) AS INT)
                   AS estimate_ok
        FROM events
    )
    SELECT * FROM per UNION ALL SELECT * FROM allrow
    """,
)
def hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via Datasketches HLL, with the 'ALL'
    row produced by UNION-MERGING the per-segment sketches
    (hll_union_agg) — never by rescanning. This is the pattern that makes
    distinct counting mergeable state at 100 TB: segment sketches build
    map-side, merge associatively across any partitioning (or any
    pre-aggregated rollup level), and the global answer costs one
    KB-sized reduce. Sketch binaries are engine-specific, so the
    cross-engine contract is bounded relative error: each engine's own
    estimate (DuckDB validates with its own approx_count_distinct) must
    land within {_HLL_TOL:.0%} of its exact distinct count; exact counts
    and segment keys stay engine-invariant. The exact countDistinct here
    is the validation harness — a production job ships only sketches."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_seg = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("n_exact"),
    )
    per = per_seg.select(
        F.col("event_type").alias("segment"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
            <= _HLL_TOL * F.col("n_exact")
        )
        .cast("int")
        .alias("estimate_ok"),
    )
    merged = per_seg.agg(F.hll_union_agg("sk").alias("u"))
    g_exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    allrow = merged.crossJoin(F.broadcast(g_exact)).select(
        F.lit("ALL").alias("segment"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("u") - F.col("n_exact"))
            <= _HLL_TOL * F.col("n_exact")
        )
        .cast("int")
        .alias("estimate_ok"),
    )
    return per.unionAll(allrow)


# --------------------------------------------------------------------------
# Kolmogorov–Smirnov two-sample drift test — exact integer form.
# --------------------------------------------------------------------------
@query(
    "ks_two_sample",
    oracle="""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tagged AS (
        SELECT d.n_chars AS v,
               CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1
        FROM documents d CROSS JOIN ref r
    ), per_v AS (
        SELECT v,
               CAST(sum(g1) AS BIGINT) AS c1,
               CAST(sum(1 - g1) AS BIGINT) AS c2
        FROM tagged GROUP BY v
    ), cum AS (
        SELECT v,
               sum(c1) OVER (ORDER BY v) AS cum1,
               sum(c2) OVER (ORDER BY v) AS cum2,
               (SELECT CAST(sum(c1) AS BIGINT) FROM per_v) AS n1,
               (SELECT CAST(sum(c2) AS BIGINT) FROM per_v) AS n2
        FROM per_v
    )
    SELECT CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
           CAST(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS DOUBLE)
               / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE))
               AS ks_stat
    FROM cum
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the document-length
    distribution of the reference source (lexicographically first, so the
    split is deterministic without configuration) and everything else —
    the standard distribution-drift gate a training-data pipeline runs
    when a new crawl lands: "does the new batch's length profile match
    the corpus?". Complements emb_drift_by_split (embedding-space drift)
    with a scalar-feature drift test.

    Exactness discipline: D = max|F1(v) - F2(v)| is computed entirely in
    integers as max|cum1*n2 - cum2*n1| over the merged support; the one
    final division to the conventional [0,1] statistic is the only float
    op, so both engines agree bit-for-bit. No sampling, no binning — the
    exact ECDF supremum.

    Scale posture: the fact-scale work is ONE groupBy on the metric value
    (map-side partials collapse duplicates); the cumulative window then
    runs over the DISTINCT metric support, whose cardinality is bounded
    by the value domain (lengths, scores), not by corpus rows — that is
    the quantity that must fit a single window partition, and for any
    bounded feature it does. For a truly continuous unbounded feature,
    quantize the metric first (the 2^-20 grid used throughout) to bound
    the support. Reference scalar-guard lineage: SURVEY §2.2 F2/F4."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tagged = docs.crossJoin(F.broadcast(ref)).select(
        F.col("n_chars").alias("v"),
        (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum(1 - F.col("g1")).cast("long").alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    totals = per_v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    cum = per_v.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    ).crossJoin(F.broadcast(totals))
    return cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.max(
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        )
        .cast("long")
        .alias("ks_num"),
        (
            F.max(
                F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
            )
            .cast("long")
            .cast("double")
            / (
                F.max("n1").cast("double")
                * F.max("n2").cast("double")
            )
        ).alias("ks_stat"),
    )


# --------------------------------------------------------------------------
# Wasserstein-1 (earth mover) distance — the magnitude-aware drift number
# the KS supremum cannot see.
# --------------------------------------------------------------------------
@query(
    "dist_wasserstein1",
    oracle="""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tagged AS (
        SELECT d.n_chars AS v,
               CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1
        FROM documents d CROSS JOIN ref r
    ), per_v AS (
        SELECT v,
               CAST(sum(g1) AS BIGINT) AS c1,
               CAST(sum(1 - g1) AS BIGINT) AS c2
        FROM tagged GROUP BY v
    ), cum AS (
        SELECT v,
               sum(c1) OVER (ORDER BY v) AS cum1,
               sum(c2) OVER (ORDER BY v) AS cum2,
               lead(v) OVER (ORDER BY v) AS nxt,
               (SELECT CAST(sum(c1) AS BIGINT) FROM per_v) AS n1,
               (SELECT CAST(sum(c2) AS BIGINT) FROM per_v) AS n2
        FROM per_v
    )
    SELECT CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN nxt IS NULL THEN 0
                         ELSE abs(cum1 * n2 - cum2 * n1) * (nxt - v)
                    END) AS BIGINT) AS w1_num,
           CAST(CAST(sum(CASE WHEN nxt IS NULL THEN 0
                              ELSE abs(cum1 * n2 - cum2 * n1) * (nxt - v)
                         END) AS BIGINT) AS DOUBLE)
               / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE))
               AS w1
    FROM cum
    """,
)
def dist_wasserstein1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 distance between the reference source's document-
    length distribution and everything else — W1 = ∫|F1 − F2| dv, the
    area between the two ECDFs. It complements ks_two_sample: KS reports
    only the WORST single gap, W1 integrates the whole mismatch in the
    metric's own units (characters here), which is the number that
    actually tracks "how much longer are the new crawl's documents".

    Exactness: on the merged support, |F1 − F2| at v is
    |cum1·n2 − cum2·n1| / (n1·n2), and the integral over the step
    function is Σ |cum1·n2 − cum2·n1| · (next_v − v) — an INTEGER sum
    (order-free, no float accumulation); the single division to w1 is
    the only float op. Bound: each term ≤ n1·n2·gap, so the BIGINT sum
    holds to ~10⁹ docs per side on a 10⁴-wide support; past that,
    quantize v to a coarser grid first (the term count shrinks with the
    support, not the corpus).

    Scale posture: identical to ks_two_sample — one fact-scale groupBy
    on the metric value, then cumulative windows over the DISTINCT
    support only (bounded by the value domain, not corpus rows)."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tagged = docs.crossJoin(F.broadcast(ref)).select(
        F.col("n_chars").alias("v"),
        (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum(1 - F.col("g1")).cast("long").alias("c2"),
    )
    w = Window.orderBy("v")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    totals = per_v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    cum = per_v.select(
        "v",
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
        F.lead("v").over(w).alias("nxt"),
    ).crossJoin(F.broadcast(totals))
    term = F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        * (F.col("nxt") - F.col("v"))
    )
    return cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum(term).cast("long").alias("w1_num"),
        (
            F.sum(term).cast("long").cast("double")
            / (F.max("n1").cast("double") * F.max("n2").cast("double"))
        ).alias("w1"),
    )


# --------------------------------------------------------------------------
# Cramér–von Mises two-sample criterion — the full-ECDF drift test that
# weights every gap, completing the KS (supremum) / W1 (area) family.
# --------------------------------------------------------------------------
@query(
    "cvm_two_sample",
    oracle="""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tagged AS (
        SELECT d.n_chars AS v,
               CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1
        FROM documents d CROSS JOIN ref r
    ), per_v AS (
        SELECT v,
               CAST(sum(g1) AS BIGINT) AS c1,
               CAST(sum(1 - g1) AS BIGINT) AS c2
        FROM tagged GROUP BY v
    ), cum AS (
        SELECT c1 + c2 AS cnt,
               sum(c1) OVER (ORDER BY v) AS cum1,
               sum(c2) OVER (ORDER BY v) AS cum2,
               (SELECT CAST(sum(c1) AS BIGINT) FROM per_v) AS n1,
               (SELECT CAST(sum(c2) AS BIGINT) FROM per_v) AS n2
        FROM per_v
    )
    SELECT CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           CAST(sum(cnt * (cum1 * n2 - cum2 * n1)
                        * (cum1 * n2 - cum2 * n1)) AS BIGINT) AS t_num,
           CAST(CAST(sum(cnt * (cum1 * n2 - cum2 * n1)
                             * (cum1 * n2 - cum2 * n1)) AS BIGINT)
                AS DOUBLE)
               / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)
                  * CAST(max(n1) + max(n2) AS DOUBLE)
                  * CAST(max(n1) + max(n2) AS DOUBLE)) AS t_stat
    FROM cum
    """,
)
def cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér–von Mises two-sample criterion on the same ref-vs-rest
    document-length split: T = n1·n2/N² · Σ_pooled (F1(x) − F2(x))²,
    summing the SQUARED ECDF gap at every pooled observation. Where KS
    keys on the single worst gap and W1 on the unweighted area, CvM
    weights gaps by how much data sits at them — the most sensitive of
    the three against mid-distribution drift, which is why drift
    monitors run all three.

    Exactness: with ties collapsed to the support, the pooled sum is
    Σ cnt_v · (cum1·n2 − cum2·n1)² — a pure INTEGER sum; dividing once
    by n1·n2·N² yields T. Bound: each term ≤ cnt·(n1·n2)², so BIGINT
    holds to ~10⁶ rows per side; past that quantize v (grid discipline)
    — the numerator scales with the support, not the corpus.

    Scale posture: identical to ks_two_sample — one metric-keyed
    fact-scale groupBy, cumulative windows over the distinct support."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tagged = docs.crossJoin(F.broadcast(ref)).select(
        F.col("n_chars").alias("v"),
        (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("g1").cast("long").alias("c1"),
        F.sum(1 - F.col("g1")).cast("long").alias("c2"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    totals = per_v.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    cum = per_v.select(
        (F.col("c1") + F.col("c2")).alias("cnt"),
        F.sum("c1").over(wc).alias("cum1"),
        F.sum("c2").over(wc).alias("cum2"),
    ).crossJoin(F.broadcast(totals))
    d = F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    return cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.sum(F.col("cnt") * d * d).cast("long").alias("t_num"),
        (
            F.sum(F.col("cnt") * d * d).cast("long").cast("double")
            / (
                F.max("n1").cast("double")
                * F.max("n2").cast("double")
                * (F.max("n1") + F.max("n2")).cast("double")
                * (F.max("n1") + F.max("n2")).cast("double")
            )
        ).alias("t_stat"),
    )


# --------------------------------------------------------------------------
# Ingestion freshness lag — the first pipeline-health dashboard number.
# --------------------------------------------------------------------------
@query(
    "dq_freshness_lag",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               max(epoch_ns(ts)) AS max_tns
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT max(max_tns) AS global_max FROM per
    )
    SELECT p.event_type, p.n_events,
           CAST(p.max_tns AS BIGINT) AS latest_tns,
           CAST(t.global_max - p.max_tns AS BIGINT) AS lag_ns,
           CAST(CAST(t.global_max - p.max_tns AS BIGINT) AS DOUBLE)
               / 3600000000000.0 AS lag_hours
    FROM per p CROSS JOIN tot t
    """,
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream ingestion freshness: how far each event type's newest
    record trails the newest record anywhere — the first number on any
    pipeline-health dashboard (a stream whose lag grows is stalled
    upstream, and a batch mix built from it silently under-represents
    recent data; the same check gates watermark choice in the streaming
    surface). Integer epoch-nanos end-to-end; the hours conversion is
    the single float division.

    Plan: one type-keyed max/count aggregation (map-side partials; max
    is order-free), a 1-row global max derived from the per-type table
    (never a second scan), broadcast back. Scan-bound at any scale."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("ts").alias("max_tns"),
    )
    tot = per.agg(F.max("max_tns").alias("global_max"))
    return per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_events",
        F.col("max_tns").cast("long").alias("latest_tns"),
        (F.col("global_max") - F.col("max_tns")).cast("long").alias("lag_ns"),
        (
            (F.col("global_max") - F.col("max_tns")).cast("long").cast("double")
            / F.lit(3600000000000.0)
        ).alias("lag_hours"),
    )


# --------------------------------------------------------------------------
# Item-item cosine from basket co-occurrence — the rec-sys similarity.
# --------------------------------------------------------------------------
ITEM_COS_MIN_CO = 2
ITEM_COS_TOPK = 20


@query(
    "item_cooccurrence_cosine",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (
        SELECT l_orderkey FROM op
        GROUP BY l_orderkey HAVING count(*) <= {MAX_BASKET}
    ),
    p AS (SELECT op.l_orderkey, op.l_partkey FROM op JOIN ok USING (l_orderkey)),
    deg AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM p GROUP BY l_partkey
    ),
    co AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS n_co
        FROM p a
        JOIN p b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= {ITEM_COS_MIN_CO}
    )
    SELECT c.part_a, c.part_b, c.n_co, da.n_orders AS n_a, db.n_orders AS n_b,
           CAST(c.n_co AS DOUBLE)
               / sqrt(CAST(da.n_orders AS DOUBLE)
                      * CAST(db.n_orders AS DOUBLE)) AS cosine
    FROM co c
    JOIN deg da ON da.l_partkey = c.part_a
    JOIN deg db ON db.l_partkey = c.part_b
    ORDER BY cosine DESC, part_a, part_b
    LIMIT {ITEM_COS_TOPK}
    """,
)
def item_cooccurrence_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity over binary basket vectors — the
    classic neighborhood-method recommender score: cos(a,b) =
    co(a,b) / √(n_a·n_b), which normalizes raw co-occurrence
    (basket_pair_counts) by popularity so two niche items bought
    together outrank two bestsellers that co-occur by volume alone; the
    lift score (basket_association_rules) answers "dependence", this
    answers "neighborhood". Min-support floors the noise pairs.

    Exactness: all three counts are exact integers; the score is two
    exact-rounded IEEE ops in pinned order (÷, √) — bit-identical
    engines — and the top-k order ties break on the pair.

    Plan (round 8, guide §2.4): the basket-pair family's in-row
    expansion — ONE collect_set aggregation builds the capped baskets
    (persisted: the pair expansion and the item-degree table both read
    it), pairs expand inside the row (never a self-join), item-degree
    lookups come back by broadcast, top-k is TakeOrderedAndProject. The
    cos denominator is why this scales: no normalization pass over
    baskets, only over the ITEM table."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
        .persist()
    )
    baskets.count()  # degree table and the pair expansion both read it
    deg = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    co = (
        baskets.select(F.explode(_basket_pairs(F.col("parts"))).alias("pr"))
        .filter(F.col("pr.a") < F.col("pr.b"))
        .groupBy(
            F.col("pr.a").alias("part_a"), F.col("pr.b").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
        .filter(F.col("n_co") >= ITEM_COS_MIN_CO)
    )
    da = deg.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_a")
    )
    db = deg.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_b")
    )
    return (
        co.join(F.broadcast(da), "part_a")
        .join(F.broadcast(db), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_co",
            "n_a",
            "n_b",
            (
                F.col("n_co").cast("double")
                / F.sqrt(F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "part_a", "part_b")
        .limit(ITEM_COS_TOPK)
    )


# --------------------------------------------------------------------------
# Mann–Whitney U: rank-based two-sample drift test with tie correction.
# --------------------------------------------------------------------------
@query(
    "mann_whitney_u",
    oracle="""
    WITH ref AS (
        SELECT min(source) AS ref_source FROM documents
    ), tagged AS (
        SELECT d.n_chars AS v,
               CASE WHEN d.source = r.ref_source THEN 1 ELSE 0 END AS g1
        FROM documents d CROSS JOIN ref r
    ), per_v AS (
        SELECT v, CAST(count(*) AS BIGINT) AS t,
               CAST(sum(g1) AS BIGINT) AS t1
        FROM tagged GROUP BY v
    ), ranked AS (
        -- 2*avg-rank of the tie block at value v: below = ranks before it
        SELECT v, t, t1,
               CAST(coalesce(sum(t) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM per_v
    ), sums AS (
        SELECT CAST(sum(t1) AS BIGINT) AS n1,
               CAST(sum(t - t1) AS BIGINT) AS n2,
               -- 2*R1 stays integer under average ranks:
               -- each g1 member at v contributes (2*below + t + 1)
               CAST(sum(t1 * (2 * below + t + 1)) AS BIGINT) AS two_r1,
               CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DOUBLE)
                   AS tie_term
        FROM ranked
    )
    SELECT n1, n2,
           (CAST(two_r1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
               - CAST(n1 AS DOUBLE) * n2 / 2.0 AS u_minus_mean,
           ((CAST(two_r1 AS DOUBLE) - n1 * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
               - CAST(n1 AS DOUBLE) * n2 / 2.0)
               / nullif(sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                       * ((n1 + n2 + 1.0)
                          - tie_term
                            / (CAST(n1 + n2 AS DOUBLE)
                               * (n1 + n2 - 1.0)))), 0.0) AS z_stat
    FROM sums
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the reference source's
    length distribution and the rest — the third leg of the drift-test
    stool: KS (ks_two_sample) sees any shape change, chi-square
    (text_token_drift_chi2) sees categorical mix, U sees LOCATION shift
    with rank-level robustness to outliers. Tie-corrected normal
    approximation, the standard large-sample form.

    Exactness: average ranks over tie blocks keep 2·R1 an exact
    INTEGER (each member of a tie block of size t starting after
    `below` items contributes rank (2·below+t+1)/2), so U derives from
    integer sums alone; the tie-corrected variance and the single z
    division are pinned IEEE ops; the Σ(t³−t) tie term accumulates in
    DECIMAL before one cast.

    Plan: identical posture to ks_two_sample — ONE value-keyed
    aggregation collapses the corpus to the distinct support, the rank
    window runs over that bounded support, and the final row is a
    1-row reduction. No sorting of raw rows anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.agg(F.min("source").alias("ref_source"))
    tagged = docs.crossJoin(F.broadcast(ref)).select(
        F.col("n_chars").alias("v"),
        (F.col("source") == F.col("ref_source")).cast("int").alias("g1"),
    )
    per_v = tagged.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("g1").cast("long").alias("t1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
    )
    sums = ranked.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * (2 * F.col("below") + F.col("t") + 1))
        .cast("long")
        .alias("two_r1"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("double")
        .alias("tie_term"),
    )
    r1 = (
        F.col("two_r1").cast("double")
        - F.col("n1") * (F.col("n1").cast("double") + F.lit(1.0))
    ) / F.lit(2.0)
    u_minus_mean = r1 - F.col("n1").cast("double") * F.col("n2") / F.lit(2.0)
    nn = F.col("n1") + F.col("n2")
    var = (
        F.col("n1").cast("double") * F.col("n2") / F.lit(12.0)
        * (
            (nn + F.lit(1.0))
            - F.col("tie_term")
            / (nn.cast("double") * (nn - F.lit(1.0)))
        )
    )
    return sums.select(
        "n1",
        "n2",
        u_minus_mean.alias("u_minus_mean"),
        (u_minus_mean / F.nullif(F.sqrt(var), F.lit(0.0))).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Statistical process control: 3-sigma limits on daily event volumes.
# --------------------------------------------------------------------------
_SPC_DAY_NS = 86_400_000_000_000


@query(
    "daily_count_control_chart",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               epoch_ns(ts) // {_SPC_DAY_NS} AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, day
    ), stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) AS q
        FROM d GROUP BY event_type
    ), lim AS (
        SELECT event_type, n_days,
               CAST(s AS DOUBLE) / n_days AS center,
               sqrt((n_days * CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                     * CAST(s AS DOUBLE))
                    / (CAST(n_days AS DOUBLE) * (n_days - 1.0))) AS sd
        FROM stats
    )
    SELECT d.event_type, d.day, d.c AS n_events,
           l.center, l.center - 3.0 * l.sd AS lcl,
           l.center + 3.0 * l.sd AS ucl,
           CASE WHEN CAST(d.c AS DOUBLE) > l.center + 3.0 * l.sd
                  OR CAST(d.c AS DOUBLE) < l.center - 3.0 * l.sd
                THEN 1 ELSE 0 END AS out_of_control
    FROM d JOIN lim l USING (event_type)
    """,
)
def daily_count_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals chart over daily event volumes per type: the
    center line and ±3σ limits come from the stream's own day-to-day
    variation, and any day outside the band flags — the
    process-control primitive behind "did ingestion break today?"
    monitors (complementing dq_freshness_lag's staleness axis with a
    VOLUME axis; anomaly_zscore does this per-event-value, this does it
    per operational day).

    Exactness: daily counts are exact integers; mean and sample sd per
    type come from integer moments via pinned single divisions (the
    events_user_burstiness discipline — Σc² accumulates in DECIMAL);
    the flag compares unrounded pinned doubles identically on both
    engines.

    Plan: one (type, day) count aggregation, one type-level moment
    rollup over day-cardinality rows, one broadcast-sized limits join
    back. Scan-bound; nothing beyond the first aggregation touches
    fact scale."""
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type",
            F.expr(f"ts div {_SPC_DAY_NS}").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("long")
        .alias("q"),
    )
    center = F.col("s").cast("double") / F.col("n_days")
    sd = F.sqrt(
        (
            F.col("n_days") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (F.col("n_days").cast("double") * (F.col("n_days") - F.lit(1.0)))
    )
    lim = stats.select(
        "event_type", center.alias("center"), sd.alias("sd")
    )
    j = d.join(F.broadcast(lim), "event_type")
    return j.select(
        "event_type",
        "day",
        F.col("c").alias("n_events"),
        "center",
        (F.col("center") - 3.0 * F.col("sd")).alias("lcl"),
        (F.col("center") + 3.0 * F.col("sd")).alias("ucl"),
        F.when(
            (F.col("c").cast("double") > F.col("center") + 3.0 * F.col("sd"))
            | (F.col("c").cast("double") < F.col("center") - 3.0 * F.col("sd")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("out_of_control"),
    )


# --------------------------------------------------------------------------
# Fact-to-fact reconciliation: order headers vs their lineitem sums.
# --------------------------------------------------------------------------
@query(
    "dq_order_lineitem_reconcile",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                   * (1.0 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS line_cents
        FROM lineitem GROUP BY l_orderkey
    ), j AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               li.line_cents
        FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(line_cents) AS BIGINT) AS n_with_lineitems,
           CAST(count(*) - count(line_cents) AS BIGINT) AS n_headers_only,
           CAST(count(*) FILTER (WHERE line_cents = header_cents)
                AS BIGINT) AS n_exact_match,
           CAST(sum(CAST(abs(header_cents - line_cents) AS DECIMAL(38,0)))
                AS BIGINT) AS total_abs_diff_cents,
           CAST(max(abs(header_cents - line_cents)) AS BIGINT)
               AS max_abs_diff_cents,
           CAST(count(*) FILTER (WHERE line_cents = header_cents)
                AS DOUBLE)
               / nullif(count(line_cents), 0) AS exact_match_rate
    FROM j
    """,
)
def dq_order_lineitem_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact reconciliation: does each order header's total agree
    with the sum of its lines at the TPC-H pricing formula
    extended·(1−disc)·(1+tax)? The cross-table consistency audit that
    referential checks (ri_orphan_audit) don't cover — keys can all
    resolve while the MONEY disagrees, which is how silent upstream
    bugs (partial loads, double-applied discounts) actually surface.
    On this synthetic fixture headers and lines are generated
    independently, so the report SHOWS a reconciliation failure — the
    operator's honesty is the point; a real warehouse alert fires on
    exact_match_rate < 1.

    Exactness: per-line cents round once (pinned float chain → integer)
    and sum exactly; header cents likewise; every reported statistic
    is an integer (diff mass accumulates in DECIMAL) except the one
    final rate division.

    Plan: one lineitem aggregation keyed on the order key, one
    co-keyed left join from headers, one 1-row rollup. Both fact scans
    stream; at 100 TB the join rides bucketed-by-orderkey layout
    shuffle-free."""
    orders = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1.0 - l_discount)"
                    " * (1.0 + l_tax) * 100) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("line_cents")
        )
    )
    j = orders.select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
            "header_cents"
        ),
    ).join(li, orders.o_orderkey == li.l_orderkey, "left")
    diff = F.abs(F.col("header_cents") - F.col("line_cents"))
    match = (F.col("line_cents") == F.col("header_cents")).cast("int")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count("line_cents").cast("long").alias("n_with_lineitems"),
        (F.count(F.lit(1)) - F.count("line_cents"))
        .cast("long")
        .alias("n_headers_only"),
        F.coalesce(F.sum(match), F.lit(0)).cast("long").alias("n_exact_match"),
        F.coalesce(F.sum(diff.cast("decimal(38,0)")), F.lit(0))
        .cast("long")
        .alias("total_abs_diff_cents"),
        F.max(diff).cast("long").alias("max_abs_diff_cents"),
        (
            F.coalesce(F.sum(match), F.lit(0)).cast("double")
            / F.nullif(F.count("line_cents").cast("double"), F.lit(0.0))
        ).alias("exact_match_rate"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation — Pearson over average ranks, integer-exact.
# --------------------------------------------------------------------------
@query(
    "spearman_rank_corr",
    oracle="""
    WITH v AS (
        SELECT n_chars AS x,
               CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT)
                   AS y
        FROM documents
    ), rx AS (
        SELECT x, CAST(count(*) AS BIGINT) AS t,
               CAST(coalesce(sum(count(*)) OVER (
                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM v GROUP BY x
    ), ry AS (
        SELECT y, CAST(count(*) AS BIGINT) AS t,
               CAST(coalesce(sum(count(*)) OVER (
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM v GROUP BY y
    ), ranked AS (
        -- 2*rank stays integer under average ranks: 2*below + t + 1
        SELECT (2 * rx.below + rx.t + 1) AS rx2,
               (2 * ry.below + ry.t + 1) AS ry2
        FROM v JOIN rx ON rx.x = v.x JOIN ry ON ry.y = v.y
    ), m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS DOUBLE) AS sxx,
               CAST(sum(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS DOUBLE) AS syy,
               CAST(sum(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS DOUBLE) AS sxy
        FROM ranked
    )
    SELECT n AS n_docs,
           (n * sxy - sx * sy)
               / nullif(sqrt(n * sxx - sx * sx)
                        * sqrt(n * syy - sy * sy), 0.0) AS spearman_rho
    FROM m
    """,
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length (n_chars) and
    whitespace count — Pearson over AVERAGE ranks, the monotone-
    association measure that sees what corr_exact's linear Pearson
    misses (and shrugs at outliers). The Mann–Whitney doubling trick
    generalizes: 2·rank = 2·(items below) + tie size + 1 is always an
    INTEGER, so every rank moment is an exact integer sum in DECIMAL
    and the factor of 2 cancels in the correlation — no float
    accumulation anywhere, one final pinned assembly.

    Plan: two value-keyed aggregations collapse each variable to its
    distinct support, the rank windows run over those bounded supports,
    and the moment pass is one partial-aggregatable reduction riding
    two broadcast-sized rank-lookup joins. The ks_two_sample posture,
    applied twice."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        F.col("n_chars").alias("x"),
        F.length(F.regexp_replace(F.col("text"), "[^ ]", "")).cast("long").alias("y"),
    )
    v = v.persist()
    v.count()  # both rank tables and the moment join read it

    def ranks(col: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            v.groupBy(col)
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .withColumn(
                "below", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
            )
            .select(
                col,
                (2 * F.col("below") + F.col("t") + 1).alias(f"r_{col}2"),
            )
        )

    ranked = v.join(F.broadcast(ranks("x")), "x").join(
        F.broadcast(ranks("y")), "y"
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r_x2").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("r_y2").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("r_x2").cast("decimal(38,0)") * F.col("r_x2"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("r_y2").cast("decimal(38,0)") * F.col("r_y2"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("r_x2").cast("decimal(38,0)") * F.col("r_y2"))
        .cast("double")
        .alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_docs"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# One-way ANOVA F: does mean document length differ across sources?
# --------------------------------------------------------------------------
@query(
    "anova_oneway_f",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS s,
               CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)
                    AS DECIMAL(38,0)) AS q
        FROM documents GROUP BY source
    ), terms AS (
        SELECT source, n, s,
               CAST(q AS DOUBLE)
                   - CAST(CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                     / CAST(n AS DOUBLE) AS w_term,
               CAST(CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS b_term
        FROM g
    ), folded AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(sum(s) AS BIGINT) AS s_tot,
               list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(source := source,
                                                  t := w_term))),
                       x -> x.t),
                   (a, b) -> a + b) AS ssw,
               list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(source := source,
                                                  t := b_term))),
                       x -> x.t),
                   (a, b) -> a + b) AS sum_b
        FROM terms
    )
    SELECT k AS k_groups, n_tot AS n_total,
           sum_b - CAST(CAST(s_tot AS DECIMAL(38,0)) * s_tot AS DOUBLE)
                   / CAST(n_tot AS DOUBLE) AS ss_between,
           ssw AS ss_within,
           (sum_b - CAST(CAST(s_tot AS DECIMAL(38,0)) * s_tot AS DOUBLE)
                    / CAST(n_tot AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
               / nullif(ssw / CAST(n_tot - k AS DOUBLE), 0.0) AS f_stat
    FROM folded
    """,
)
def anova_oneway_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across sources on document length — the k-sample
    mean-comparison leg of the drift family (mann_whitney_u compares two
    groups by rank; this compares ALL source means at once). A large F
    says the source mix alone shifts the length distribution — the
    signal source_mixture_weights then acts on.

    Exactness: per-group n, Σv, Σv² are exact integer sums (the square
    accumulates in DECIMAL(38,0)); each group's s²/n appears as ONE
    double division of exact operands; SSW and Σs²/n fold over groups in
    sorted-source order with a 0.0 seed (chisq discipline); the grand
    S²/N correction and the two dof divisions are pinned IEEE ops.

    Plan: ONE source-keyed partial-aggregatable rollup collapses the
    corpus to |sources| rows; the folds run on that tiny relation inside
    a single 1-row aggregation. Scan-bound at any SF."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    terms = g.select(
        "source",
        "n",
        "s",
        (
            F.col("q").cast("double")
            - (F.col("s").cast("decimal(38,0)") * F.col("s")).cast("double")
            / F.col("n").cast("double")
        ).alias("w_term"),
        (
            (F.col("s").cast("decimal(38,0)") * F.col("s")).cast("double")
            / F.col("n").cast("double")
        ).alias("b_term"),
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s").cast("long").alias("s_tot"),
        F.sort_array(F.collect_list(F.struct("source", F.col("w_term").alias("t")))).alias("__w"),
        F.sort_array(F.collect_list(F.struct("source", F.col("b_term").alias("t")))).alias("__b"),
    ).select(
        "k",
        "n_tot",
        "s_tot",
        F.expr(
            "aggregate(transform(__w, x -> x.t), CAST(0.0 AS DOUBLE),"
            " (a, b) -> a + b)"
        ).alias("ssw"),
        F.expr(
            "aggregate(transform(__b, x -> x.t), CAST(0.0 AS DOUBLE),"
            " (a, b) -> a + b)"
        ).alias("sum_b"),
    )
    grand = (
        (F.col("s_tot").cast("decimal(38,0)") * F.col("s_tot")).cast("double")
        / F.col("n_tot").cast("double")
    )
    ssb = F.col("sum_b") - grand
    return folded.select(
        F.col("k").alias("k_groups"),
        F.col("n_tot").alias("n_total"),
        ssb.alias("ss_between"),
        F.col("ssw").alias("ss_within"),
        (
            ssb / (F.col("k") - 1).cast("double")
            / F.nullif(
                F.col("ssw") / (F.col("n_tot") - F.col("k")).cast("double"),
                F.lit(0.0),
            )
        ).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H: the rank-based (distribution-free) k-sample test.
# --------------------------------------------------------------------------
@query(
    "kruskal_wallis",
    oracle="""
    WITH per_gv AS (
        SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS tg
        FROM documents GROUP BY source, n_chars
    ), per_v AS (
        SELECT v, CAST(sum(tg) AS BIGINT) AS t
        FROM per_gv GROUP BY v
    ), ranked AS (
        SELECT v, t,
               CAST(coalesce(sum(t) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS below
        FROM per_v
    ), per_g AS (
        SELECT g.source,
               CAST(sum(g.tg) AS BIGINT) AS n_g,
               CAST(sum(g.tg * (2 * r.below + r.t + 1)) AS BIGINT) AS two_r
        FROM per_gv g JOIN ranked r ON r.v = g.v
        GROUP BY g.source
    ), ties AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DOUBLE)
                   AS tie_term
        FROM per_v
    ), folded AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n_g) AS BIGINT) AS n_tot,
               list_reduce(
                   [0.0] || list_transform(
                       list_sort(list(struct_pack(source := source,
                           t := CAST(CAST(two_r AS DECIMAL(38,0)) * two_r
                                     AS DOUBLE)
                                / CAST(4 * n_g AS DOUBLE)))),
                       x -> x.t),
                   (a, b) -> a + b) AS sum_r2n
        FROM per_g
    )
    SELECT k AS k_groups, n_tot AS n_total,
           12.0 * sum_r2n / (CAST(n_tot AS DOUBLE) * (n_tot + 1.0))
               - 3.0 * (n_tot + 1.0) AS h_stat,
           (12.0 * sum_r2n / (CAST(n_tot AS DOUBLE) * (n_tot + 1.0))
               - 3.0 * (n_tot + 1.0))
               / nullif(1.0 - t.tie_term
                        / (CAST(CAST(n_tot AS DECIMAL(38,0)) * n_tot * n_tot
                                - n_tot AS DOUBLE)), 0.0) AS h_adj
    FROM folded CROSS JOIN ties t
    """,
)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across sources on document length — the
    distribution-free counterpart of anova_oneway_f (exactly as
    mann_whitney_u is to the two-sample t): compares ALL k source rank
    distributions at once, robust to outliers and any monotone
    transform. Tie-corrected (h_adj) in the standard Σ(t³−t) form.

    Exactness: the global rank machinery is mann_whitney_u's — per-value
    tie blocks give each group an exact INTEGER 2·R_g; each group's
    R_g²/n_g is ONE double division of exact operands ((2R)²/(4n));
    the k terms fold in sorted-source order with a 0.0 seed; the H
    assembly and the tie-correction division are pinned IEEE ops with
    DECIMAL-routed big-integer casts (N³ − N).

    Plan: (source, value)-keyed rollup collapses the corpus; the global
    support table and its rank window are value-scale; the group join is
    value-keyed; everything after is |sources|-scale. No raw-row sort."""
    docs = load_table(spark, sf_dir, "documents")
    per_gv = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("tg")
    )
    per_v = per_gv.groupBy("v").agg(F.sum("tg").cast("long").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "below", F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long")
    )
    per_g = (
        per_gv.join(ranked, "v")
        .groupBy("source")
        .agg(
            F.sum("tg").cast("long").alias("n_g"),
            F.sum(
                F.col("tg") * (2 * F.col("below") + F.col("t") + 1)
            )
            .cast("long")
            .alias("two_r"),
        )
    )
    ties = per_v.agg(
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("double")
        .alias("tie_term")
    )
    term = (
        (F.col("two_r").cast("decimal(38,0)") * F.col("two_r")).cast("double")
        / (4 * F.col("n_g")).cast("double")
    )
    folded = per_g.select("source", "n_g", term.alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n_tot"),
        F.sort_array(F.collect_list(F.struct("source", "t"))).alias("__lst"),
    ).select(
        "k",
        "n_tot",
        F.expr(
            "aggregate(transform(__lst, x -> x.t), CAST(0.0 AS DOUBLE),"
            " (a, b) -> a + b)"
        ).alias("sum_r2n"),
    )
    h = (
        F.lit(12.0)
        * F.col("sum_r2n")
        / (F.col("n_tot").cast("double") * (F.col("n_tot") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("n_tot") + F.lit(1.0))
    )
    n_cubed = (
        F.col("n_tot").cast("decimal(38,0)") * F.col("n_tot") * F.col("n_tot")
        - F.col("n_tot")
    ).cast("double")
    return folded.crossJoin(F.broadcast(ties)).select(
        F.col("k").alias("k_groups"),
        F.col("n_tot").alias("n_total"),
        h.alias("h_stat"),
        (
            h
            / F.nullif(
                F.lit(1.0) - F.col("tie_term") / n_cubed, F.lit(0.0)
            )
        ).alias("h_adj"),
    )


# --------------------------------------------------------------------------
# Kendall tau-b between length band and quality decile — the pair-
# concordance leg of the association family.
# --------------------------------------------------------------------------
KENDALL_X_BAND = 64  # chars per length band (support knob, mirrored in SQL)


def _kendall_oracle() -> str:
    from ..operators import textstats as _textstats  # noqa: F401  (registers text_quality)
    from ..registry import ORACLES

    return f"""
    WITH q AS MATERIALIZED ({ORACLES['text_quality']}),
    v AS (
        SELECT CAST(d.n_chars // {KENDALL_X_BAND} AS BIGINT) AS x,
               greatest(least(CAST(round(q.quality * 1000000) AS BIGINT)
                              // 100000, 9), 0) AS y
        FROM documents d JOIN q ON q.doc_id = d.doc_id
        WHERE q.quality IS NOT NULL
    ), cells AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS c
        FROM v GROUP BY x, y
    ), pairs AS (
        SELECT CAST(coalesce(sum(CASE WHEN a.y < b.y
                       THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0)
                    AS BIGINT) AS conc,
               CAST(coalesce(sum(CASE WHEN a.y > b.y
                       THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0)
                    AS BIGINT) AS disc
        FROM cells a JOIN cells b ON a.x < b.x
    ), m1 AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS BIGINT) // 2
                   AS n1
        FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY x)
    ), m2 AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS BIGINT) // 2
                   AS n2
        FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY y)
    ), nt AS (
        SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(CAST(sum(c) AS DECIMAL(38,0)) * (sum(c) - 1)
                    AS BIGINT) // 2 AS n0
        FROM cells
    )
    SELECT nt.n AS n_docs, p.conc, p.disc, m1.n1, m2.n2,
           CAST(p.conc - p.disc AS DOUBLE)
               / nullif(sqrt(CAST(nt.n0 - m1.n1 AS DOUBLE))
                        * sqrt(CAST(nt.n0 - m2.n2 AS DOUBLE)), 0.0) AS tau_b
    FROM pairs p CROSS JOIN nt CROSS JOIN m1 CROSS JOIN m2
    """


@query("kendall_tau_b", oracle=_kendall_oracle())
def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between the document length band (n_chars // 64) and
    the quality decile — the pair-concordance association measure that
    completes the family: corr_exact (linear), spearman_rank_corr
    (monotone via ranks), tau-b (monotone via concordant/discordant
    PAIRS, with the cleanest tie story and direct interpretation as
    P(concordant) − P(discordant)). Banding is the published scale knob:
    it bounds the cell support so the pair join is support², never
    corpus² (theil_sen's calendar-scale-pairs discipline).

    Exactness: concordant/discordant masses are Σ c_a·c_b over cell
    pairs — exact integers in DECIMAL; tie terms n1/n2 come from
    marginal counts t(t−1)/2 (always even product, integer division
    exact); tau_b = (C−D)/(√(n0−n1)·√(n0−n2)) is a pinned assembly of
    exact operands.

    Plan: ONE (x,y)-keyed rollup collapses the corpus to ≤ |bands|x10
    cells; the x-inequality pair join is a nested loop over that tiny
    relation (≤ ~650 cells at sf0.1 → ≤ 0.2M pairs); marginals are two
    more cell-scale rollups. Corpus cost = one scan + one shuffle."""
    from ..registry import QUERIES

    q = QUERIES["text_quality"](spark, sf_dir).filter(
        F.col("quality").isNotNull()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    v = docs.join(q.select("doc_id", "quality"), "doc_id").select(
        F.expr(f"CAST(n_chars DIV {KENDALL_X_BAND} AS BIGINT)").alias("x"),
        F.expr(
            "greatest(least(CAST(round(quality * 1000000) AS BIGINT)"
            " DIV 100000, 9), 0)"
        ).alias("y"),
    )
    cells = v.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).persist()
    cells.count()  # pair join (both sides) + marginals read it
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    prod = F.col("ac").cast("decimal(38,0)") * F.col("bc")
    pairs = (
        a.join(b, F.col("ax") < F.col("bx"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ay") < F.col("by"), prod)), F.lit(0)
            )
            .cast("long")
            .alias("conc"),
            F.coalesce(
                F.sum(F.when(F.col("ay") > F.col("by"), prod)), F.lit(0)
            )
            .cast("long")
            .alias("disc"),
        )
    )
    tx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("t"))
    ty = cells.groupBy("y").agg(F.sum("c").cast("long").alias("t"))
    n_tot = cells.agg(F.sum("c").cast("long").alias("n"))
    tie = lambda df: df.agg(
        (
            F.sum(F.col("t").cast("decimal(38,0)") * (F.col("t") - 1)).cast(
                "long"
            )
            / F.lit(2)
        )
        .cast("long")
        .alias("ties")
    )
    n1 = tie(tx).select(F.col("ties").alias("n1"))
    n2 = tie(ty).select(F.col("ties").alias("n2"))
    joined = (
        pairs.crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    n0 = (
        F.col("n").cast("decimal(38,0)") * (F.col("n") - 1) / F.lit(2)
    ).cast("long")
    return joined.select(
        F.col("n").alias("n_docs"),
        "conc",
        "disc",
        "n1",
        "n2",
        (
            (F.col("conc") - F.col("disc")).cast("double")
            / F.nullif(
                F.sqrt((n0 - F.col("n1")).cast("double"))
                * F.sqrt((n0 - F.col("n2")).cast("double")),
                F.lit(0.0),
            )
        ).alias("tau_b"),
    )


# --------------------------------------------------------------------------
# k-anonymity audit over the documents quasi-identifier tuple.
# --------------------------------------------------------------------------
KANON_LEN_BAND = 256  # chars per length band in the quasi-identifier
KANON_KS = (2, 5, 10)


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT lang, source, n_chars // {KANON_LEN_BAND} AS len_band,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2, 3
    ), ks AS (
        SELECT unnest([{', '.join(str(k) for k in KANON_KS)}]) AS k
    )
    SELECT ks.k,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN c.cnt < ks.k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below,
           CAST(sum(CASE WHEN c.cnt < ks.k THEN c.cnt ELSE 0 END) AS BIGINT)
               AS n_docs_at_risk,
           CAST(sum(CASE WHEN c.cnt < ks.k THEN c.cnt ELSE 0 END) AS DOUBLE)
               / CAST(sum(c.cnt) AS DOUBLE) AS risk_share
    FROM classes c CROSS JOIN ks
    GROUP BY ks.k
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: treat (lang, source, length band) as the
    quasi-identifier tuple a release would expose, and for each policy
    threshold k report how many equivalence classes fall below k and
    what share of documents sits in them — the re-identification-risk
    readout a privacy review asks for before a corpus ships, and the
    direct measure of how much generalization/suppression a k-anonymous
    release would cost.

    Exactness: class sizes and tallies are exact integers; risk_share is
    one IEEE division. Plan: ONE aggregation over the fact table keyed by
    the QI tuple, then the 3-row threshold table cross-joins into the
    already-reduced class list (broadcast) and a ≤3-group rollup
    finishes — at 100 TB only the QI agg touches fact rows."""
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars DIV {KANON_LEN_BAND}").alias("len_band"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in KANON_KS])).alias("k")
    )
    below = F.when(F.col("cnt") < F.col("k"), F.col("cnt")).otherwise(0)
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("cnt") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below"),
            F.sum(below).cast("long").alias("n_docs_at_risk"),
            (
                F.sum(below).cast("double")
                / F.sum("cnt").cast("double")
            ).alias("risk_share"),
        )
    )


# --------------------------------------------------------------------------
# Candidate functional-dependency audit: does A determine B?
# --------------------------------------------------------------------------
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderdate"),  # PK: must hold
    ("orders", "o_custkey", "o_orderpriority"),  # expected violated
    ("lineitem", "l_orderkey", "l_shipdate"),  # expected violated
    ("events", "user_id", "event_type"),  # expected violated
)


def _fd_oracle() -> str:
    rows = "\n    UNION ALL\n".join(
        f"""    SELECT '{t}.{a} -> {b}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS violation_share,
           CAST(max(k) AS BIGINT) AS max_rhs_per_lhs
    FROM (SELECT {a}, count(DISTINCT {b}) AS k FROM {t} GROUP BY {a})"""
        for t, a, b in _FD_CANDIDATES
    )
    return rows


@query("fd_candidate_audit", oracle=_fd_oracle())
def fd_candidate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit for candidate A→B rules: for each
    candidate, the number of left-hand values, how many of them map to
    more than one right-hand value (violations), the violation share,
    and the worst fan-out — the profiling primitive behind key
    discovery, denormalization checks, and "can I treat this column as
    an attribute of that one?" questions. The candidate set mixes a true
    key dependency (o_orderkey → o_orderdate must audit clean) with
    expected-violated pairs, so the report is self-validating.

    Exactness: pure integer tallies (count distinct, conditional count,
    max) and one division per row.

    Plan: one A-keyed count-distinct aggregation per candidate (each
    partial-aggregatable on its own key) + a 1-row rollup each; the four
    branches union. At 100 TB each candidate costs one keyed pass over
    its table — the scans are column-pruned to (A, B)."""
    out = None
    for t, a, b in _FD_CANDIDATES:
        tbl = load_table(spark, sf_dir, t)
        k = tbl.groupBy(a).agg(F.countDistinct(b).alias("k"))
        row = k.agg(
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_lhs"),
            (
                F.sum(F.when(F.col("k") > 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("violation_share"),
            F.max("k").cast("long").alias("max_rhs_per_lhs"),
        ).select(
            F.lit(f"{t}.{a} -> {b}").alias("fd"),
            "n_lhs",
            "n_violating_lhs",
            "violation_share",
            "max_rhs_per_lhs",
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# l-diversity audit: the sensitive-attribute companion to k-anonymity.
# --------------------------------------------------------------------------
LDIV_LS = (2, 3, 4)


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT source, n_chars // {KANON_LEN_BAND} AS len_band,
               CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2
    ), ls AS (
        SELECT unnest([{', '.join(str(v) for v in LDIV_LS)}]) AS l
    )
    SELECT ls.l,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN c.l_distinct < ls.l THEN 1 ELSE 0 END) AS BIGINT)
               AS n_classes_below,
           CAST(sum(CASE WHEN c.l_distinct < ls.l THEN c.cnt ELSE 0 END) AS BIGINT)
               AS n_docs_at_risk,
           CAST(sum(CASE WHEN c.l_distinct < ls.l THEN c.cnt ELSE 0 END) AS DOUBLE)
               / CAST(sum(c.cnt) AS DOUBLE) AS risk_share
    FROM classes c CROSS JOIN ls
    GROUP BY ls.l
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: k-anonymity alone still leaks when every member
    of a quasi-identifier class shares the SAME sensitive value (the
    homogeneity attack), so the companion number is how many distinct
    sensitive values each class carries. QI = (source, length band) —
    deliberately EXCLUDING the sensitive attribute (lang) that
    k_anonymity_audit folds into its tuple — and for each policy l the
    audit reports classes below l and the share of documents in them.

    Exactness: per-class distinct counts and tallies are exact integers;
    risk_share is one IEEE division. Plan: ONE exact two-level distinct
    aggregation over the fact table keyed by the QI tuple (partial
    per-(QI, lang) collapse map-side, then the distinct count), then the
    3-row threshold table broadcast-crossJoins into the reduced class
    list and a <=3-group rollup finishes — same 100 TB shape as
    k_anonymity_audit."""
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "source",
        F.expr(f"n_chars DIV {KANON_LEN_BAND}").alias("len_band"),
    ).agg(
        F.count_distinct("lang").cast("long").alias("l_distinct"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    ls = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in LDIV_LS])).alias("l")
    )
    below = F.when(F.col("l_distinct") < F.col("l"), F.col("cnt")).otherwise(0)
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("l_distinct") < F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("n_classes_below"),
            F.sum(below).cast("long").alias("n_docs_at_risk"),
            (
                F.sum(below).cast("double") / F.sum("cnt").cast("double")
            ).alias("risk_share"),
        )
    )


# --------------------------------------------------------------------------
# t-closeness audit — the third leg of the release-privacy triple.
# --------------------------------------------------------------------------
@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH cls AS (
        SELECT source, n_chars // {KANON_LEN_BAND} AS len_band,
               CAST(count(*) AS BIGINT) AS n_c
        FROM documents GROUP BY 1, 2
    ), lg AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS cnt_v FROM documents
        GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    ), cell AS (
        SELECT source, n_chars // {KANON_LEN_BAND} AS len_band, lang,
               CAST(count(*) AS BIGINT) AS cnt_cv
        FROM documents GROUP BY 1, 2, 3
    ), grid AS (
        SELECT c.source, c.len_band, c.n_c, l.lang, l.cnt_v, t.n,
               coalesce(x.cnt_cv, 0) AS cnt_cv
        FROM cls c CROSS JOIN lg l CROSS JOIN tot t
        LEFT JOIN cell x ON x.source = c.source
                        AND x.len_band = c.len_band AND x.lang = l.lang
    )
    SELECT source, len_band,
           CAST(max(n_c) AS BIGINT) AS class_size,
           CAST(sum(abs(cnt_cv * n - cnt_v * n_c)) AS BIGINT) AS t_num,
           CAST(CAST(sum(abs(cnt_cv * n - cnt_v * n_c)) AS BIGINT) AS DOUBLE)
               / CAST(2 * max(n_c) * max(n) AS BIGINT) AS t_closeness
    FROM grid GROUP BY source, len_band
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third leg of the release-privacy triple:
    k-anonymity bounds class SIZE, l-diversity bounds sensitive-value
    COUNT, but a class can pass both while its sensitive distribution
    (lang here) still differs wildly from the corpus-wide one, which is
    itself a disclosure (the skewness attack). Per QI class
    (source, length band — the l_diversity_audit tuple), this reports
    the total-variation distance between the class's language mix and
    the global mix; a t-close release requires every class's distance
    ≤ t (0.15–0.2 is the usual policy band).

    Exactness: TV = ½ Σ_v |p_c(v) − p(v)| clears denominators to the
    INTEGER Σ_v |cnt_cv·n − cnt_v·n_c| (order-free sum), divided once
    by the exact integer 2·n_c·n — bit-identical engines. Absent
    (class, lang) cells enter as cnt_cv = 0 via the grid, which the TV
    sum requires.

    Plan: three fact-scale rollups (class, lang, cell) then a
    classes × langs grid — both sides are ROLLUP-sized (QI classes and
    the language inventory), so the grid is metadata-scale at 100 TB;
    the cell join is broadcast-able and the final rollup is per-class."""
    docs = load_table(spark, sf_dir, "documents")
    lb = F.expr(f"n_chars DIV {KANON_LEN_BAND}")
    cls = docs.groupBy("source", lb.alias("len_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    lg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_v")
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cell = docs.groupBy(
        "source", lb.alias("len_band"), "lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt_cv"))
    grid = (
        cls.crossJoin(F.broadcast(lg))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cell), ["source", "len_band", "lang"], "left")
        .select(
            "source",
            "len_band",
            "n_c",
            "cnt_v",
            "n",
            F.coalesce(F.col("cnt_cv"), F.lit(0)).alias("cnt_cv"),
        )
    )
    term = F.abs(F.col("cnt_cv") * F.col("n") - F.col("cnt_v") * F.col("n_c"))
    return grid.groupBy("source", "len_band").agg(
        F.max("n_c").cast("long").alias("class_size"),
        F.sum(term).cast("long").alias("t_num"),
        (
            F.sum(term).cast("long").cast("double")
            / (F.lit(2) * F.max("n_c") * F.max("n")).cast("long")
        ).alias("t_closeness"),
    )


# --------------------------------------------------------------------------
# Right-to-be-forgotten purge sizing: the FK cascade, counted exactly.
# --------------------------------------------------------------------------
FORGET_MOD = 97  # deterministic ~1% forget-set: key % 97 == 0


@query(
    "deletion_cascade_audit",
    oracle=f"""
    WITH fc AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {FORGET_MOD} = 0
    ), fo AS (
        SELECT o.o_orderkey FROM orders o
        WHERE EXISTS (SELECT 1 FROM fc WHERE fc.c_custkey = o.o_custkey)
    ), stats AS (
        SELECT 'customer' AS tbl,
               CAST((SELECT count(*) FROM fc) AS BIGINT) AS n_purged,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total
        UNION ALL
        SELECT 'orders',
               CAST((SELECT count(*) FROM fo) AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE EXISTS (SELECT 1 FROM fo
                                   WHERE fo.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'events',
               CAST((SELECT count(*) FROM events
                     WHERE user_id % {FORGET_MOD} = 0) AS BIGINT),
               CAST((SELECT count(*) FROM events) AS BIGINT)
    )
    SELECT tbl, n_purged, n_total,
           CAST(n_purged AS DOUBLE) / CAST(n_total AS DOUBLE) AS purge_share
    FROM stats
    """,
)
def deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge sizing: given a deterministic ~1%
    forget-set of customers (key % {FORGET_MOD} == 0), count exactly
    what a compliant deletion touches — the customer rows themselves,
    their orders (FK cascade), those orders' lineitems (second-level
    cascade), and the users' event streams — with each table's purge
    share. This is the operational number a GDPR/LGPD erasure run needs
    BEFORE executing: what fraction of each table rewrites (on
    copy-on-write storage, purge share ≈ write amplification; compare
    cow_write_amplification).

    Exactness: four exact counts + totals; one division per row.

    Plan: the cascade levels are key-equi semi joins (customer→orders
    on custkey, orders→lineitem on orderkey) — each FK edge is one
    bucketed-joinable shuffle, never a scan per forgotten user; the
    events leg is a pushed-down scan predicate. At 100 TB the semi
    joins broadcast the (tiny) forget frontier."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    fc = cust.filter(F.expr(f"c_custkey % {FORGET_MOD} = 0")).select(
        "c_custkey"
    )
    fo = orders.join(
        F.broadcast(fc), orders["o_custkey"] == fc["c_custkey"], "left_semi"
    ).select("o_orderkey")

    def row(name: str, purged: DataFrame, total: DataFrame) -> DataFrame:
        n_p = purged.agg(F.count(F.lit(1)).cast("long").alias("n_purged"))
        n_t = total.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        return n_p.crossJoin(F.broadcast(n_t)).select(
            F.lit(name).alias("tbl"),
            "n_purged",
            "n_total",
            (
                F.col("n_purged").cast("double")
                / F.col("n_total").cast("double")
            ).alias("purge_share"),
        )

    fl = li.join(
        F.broadcast(fo), li["l_orderkey"] == fo["o_orderkey"], "left_semi"
    )
    fe = ev.filter(F.expr(f"user_id % {FORGET_MOD} = 0"))
    return (
        row("customer", fc, cust)
        .unionByName(row("orders", fo, orders))
        .unionByName(row("lineitem", fl, li))
        .unionByName(row("events", fe, ev))
    )


# --------------------------------------------------------------------------
# Population-stability index: per-source drift of the document-length
# distribution against the pooled corpus — the standard ML-monitoring
# drift number.
# --------------------------------------------------------------------------
PSI_BIN_CHARS = 100  # chars per length bin
PSI_N_BINS = 10  # fixed bin count (last bin is open-ended via clamp)


@query(
    "score_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT source, least(n_chars // {PSI_BIN_CHARS}, {PSI_N_BINS - 1}) AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2
    ), srcs AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n_src FROM binned GROUP BY 1
    ), pooled AS (
        SELECT b, CAST(sum(cnt) AS BIGINT) AS cnt_all FROM binned GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_all FROM binned
    ), grid AS (
        SELECT s.source, s.n_src, g.b,
               coalesce(x.cnt, 0) AS c_sb,
               coalesce(p.cnt_all, 0) AS c_b
        FROM srcs s
        CROSS JOIN (SELECT unnest(generate_series(0, {PSI_N_BINS - 1})) AS b) g
        LEFT JOIN binned x ON x.source = s.source AND x.b = g.b
        LEFT JOIN pooled p ON p.b = g.b
    ), terms AS (
        SELECT source, n_src,
               list_sort(list(struct_pack(b := b, c_sb := c_sb, c_b := c_b)))
                   AS lst
        FROM grid GROUP BY source, n_src
    )
    SELECT source, n_src AS n_docs,
           round(list_reduce([0.0] || list_transform(lst, x ->
               (((x.c_sb + 1) / (n_src + {PSI_N_BINS}))
                - ((x.c_b + 1) / (n_all + {PSI_N_BINS})))
               * ln(((x.c_sb + 1) / (n_src + {PSI_N_BINS}))
                    / ((x.c_b + 1) / (n_all + {PSI_N_BINS})))),
               (a, b) -> a + b), 6) + 0.0 AS psi
    FROM terms, tot
    """,
)
def score_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index of each source's document-length
    distribution against the pooled corpus: psi = sum_b (p_b - q_b) *
    ln(p_b / q_b) over 10 fixed length bins with add-one
    (Laplace) smoothing so empty bins stay finite — PSI >= 0, with the
    conventional 0.1 / 0.25 watch/alarm thresholds. This is the drift
    gate a production corpus refresh runs per shard before admitting a
    new crawl slice.

    Determinism: bin counts are exact integers; the smoothed shares are
    single integer-ratio divisions (identically rounded on both
    engines); the per-source fold runs in SORTED bin order over a
    10-term list (entropy_fold discipline) — bounded by the
    bin count, never by fact rows.

    Plan: ONE (source, bin)-keyed pass over the fact table, then
    everything runs on the <=source*bin reduced relation: marginals,
    the literal bin grid (broadcast), and per-source 10-term folds."""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.groupBy(
        "source",
        F.least(
            F.expr(f"n_chars DIV {PSI_BIN_CHARS}"), F.lit(PSI_N_BINS - 1)
        ).alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    binned = binned.persist()
    binned.count()
    srcs = binned.groupBy("source").agg(F.sum("cnt").cast("long").alias("n_src"))
    pooled = binned.groupBy("b").agg(F.sum("cnt").cast("long").alias("cnt_all"))
    tot = binned.agg(F.sum("cnt").cast("long").alias("n_all"))
    grid = spark.range(PSI_N_BINS).select(F.col("id").cast("long").alias("b"))
    cells = (
        srcs.alias("s")
        .crossJoin(F.broadcast(grid.alias("g")))
        .join(
            binned.alias("x"),
            (F.col("x.source") == F.col("s.source"))
            & (F.col("x.b") == F.col("g.b")),
            "left",
        )
        .join(pooled.alias("p"), F.col("p.b") == F.col("g.b"), "left")
        .select(
            F.col("s.source").alias("source"),
            F.col("s.n_src").alias("n_src"),
            F.col("g.b").alias("b"),
            F.coalesce(F.col("x.cnt"), F.lit(0)).alias("c_sb"),
            F.coalesce(F.col("p.cnt_all"), F.lit(0)).alias("c_b"),
        )
    )
    terms = cells.groupBy("source", "n_src").agg(
        F.sort_array(F.collect_list(F.struct("b", "c_sb", "c_b"))).alias("lst")
    )
    fold = (
        f"aggregate(transform(lst, x -> "
        f"(((x.c_sb + 1) / (n_src + {PSI_N_BINS}))"
        f" - ((x.c_b + 1) / (n_all + {PSI_N_BINS})))"
        f" * ln(((x.c_sb + 1) / (n_src + {PSI_N_BINS}))"
        f"      / ((x.c_b + 1) / (n_all + {PSI_N_BINS})))), "
        f"CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_src").alias("n_docs"),
            (F.round(F.expr(fold), 6) + F.lit(0.0)).alias("psi"),
        )
    )


# --------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-source rates — the small-segment
# stabilizer for any per-segment rate dashboard.
# --------------------------------------------------------------------------
_EB_SHORT_CHARS = 200  # "short document" threshold


@query(
    "empirical_bayes_rates",
    oracle=f"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN n_chars < {_EB_SHORT_CHARS}
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM documents GROUP BY source
    ), lst AS (
        SELECT CAST(count(*) AS BIGINT) AS s,
               list_sort(list(struct_pack(source := source, k := k,
                                          n := n))) AS l
        FROM per
    ), mom AS (
        SELECT s,
               list_reduce([0.0] || list_transform(l,
                   x -> (x.k / x.n) / s), (a, b) -> a + b) AS m,
               list_reduce([0.0] || list_transform(l,
                   x -> ((x.k / x.n) * (x.k / x.n)) / s),
                   (a, b) -> a + b) AS ex2
        FROM lst
    ), ab AS (
        SELECT s, m, ex2 - m * m AS v,
               CASE WHEN ex2 - m * m > 0 AND m > 0 AND m < 1 AND s >= 2
                         AND m * (1 - m) > ex2 - m * m
                    THEN m * (m * (1 - m) / (ex2 - m * m) - 1)
                    END AS alpha,
               CASE WHEN ex2 - m * m > 0 AND m > 0 AND m < 1 AND s >= 2
                         AND m * (1 - m) > ex2 - m * m
                    THEN (1 - m) * (m * (1 - m) / (ex2 - m * m) - 1)
                    END AS beta
        FROM mom
    )
    SELECT per.source, per.n AS n_docs, per.k AS k_short,
           CAST(per.k AS DOUBLE) / per.n AS raw_rate,
           CASE WHEN ab.alpha IS NULL THEN CAST(per.k AS DOUBLE) / per.n
                ELSE (per.k + ab.alpha) / (per.n + ab.alpha + ab.beta)
                END AS shrunk_rate,
           ab.alpha, ab.beta
    FROM per CROSS JOIN ab
    """,
)
def empirical_bayes_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of each source's
    short-document rate toward the cross-source prior: a Beta(α, β) is
    fit by method of moments to the observed per-source rates, then each
    source reports (k + α)/(n + α + β) next to its raw k/n — small
    sources shrink hard toward the pool, large sources barely move. The
    standard stabilizer for per-segment CTR/defect-rate dashboards where
    tiny segments would otherwise dominate the alert list (Robbins'
    empirical Bayes; the baseball-batting-average construction).

    Exactness: k and n are exact integers; the rate moments fold in
    SORTED source order over the source-bounded list (entropy_fold
    discipline); the α/β chain and each shrunk rate are pinned
    closed-form expressions over those scalars. When the moment fit is
    degenerate (zero variance, boundary mean, or v >= m(1-m)) α/β are
    NULL and the shrunk rate falls back to the raw rate — the guard is
    part of the contract, not an error path.

    Plan: one source-keyed pass over the fact table, a 1-row moment
    fold over the ≤|sources| list, and a broadcast cross join back —
    scan-bound at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("n_chars") < _EB_SHORT_CHARS, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    per = per.persist()
    per.count()
    lst = per.agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sort_array(F.collect_list(F.struct("source", "k", "n"))).alias("l"),
    )
    mom = lst.select(
        "s",
        F.expr(
            "aggregate(transform(l, x -> (x.k / x.n) / s), "
            "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("m"),
        F.expr(
            "aggregate(transform(l, x -> ((x.k / x.n) * (x.k / x.n)) / s), "
            "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("ex2"),
    )
    valid = (
        "ex2 - m * m > 0 AND m > 0 AND m < 1 AND s >= 2 "
        "AND m * (1 - m) > ex2 - m * m"
    )
    ab = mom.select(
        F.expr(
            f"CASE WHEN {valid} "
            "THEN m * (m * (1 - m) / (ex2 - m * m) - 1) END"
        ).alias("alpha"),
        F.expr(
            f"CASE WHEN {valid} "
            "THEN (1 - m) * (m * (1 - m) / (ex2 - m * m) - 1) END"
        ).alias("beta"),
    )
    return per.crossJoin(F.broadcast(ab)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("k").alias("k_short"),
        (F.col("k").cast("double") / F.col("n")).alias("raw_rate"),
        F.expr(
            "CASE WHEN alpha IS NULL THEN CAST(k AS DOUBLE) / n "
            "ELSE (k + alpha) / (n + alpha + beta) END"
        ).alias("shrunk_rate"),
        "alpha",
        "beta",
    )


# --------------------------------------------------------------------------
# Mutual-information feature ranking — which banded feature predicts the
# language label, with a parity control pinned at ~zero.
# --------------------------------------------------------------------------
_MI_LEN_BIN = 100
_MI_LEN_BINS = 10


def _mi_fold(lst: str, f: str) -> str:
    return (
        f"aggregate(transform({lst}, "
        f"x -> -(x.{f} / n_docs) * ln(x.{f} / n_docs)), "
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )


def _mi_fold_sql(lst: str, f: str) -> str:
    return (
        f"list_reduce([0.0] || list_transform({lst}, "
        f"x -> -(x.{f} / n_docs) * ln(x.{f} / n_docs)), (a, b) -> a + b)"
    )


@query(
    "feature_mi_ranking",
    oracle=f"""
    WITH base AS (
        SELECT lang, 'len_band' AS feature,
               CAST(least(n_chars // {_MI_LEN_BIN}, {_MI_LEN_BINS - 1})
                    AS VARCHAR) AS fv
        FROM documents
        UNION ALL
        SELECT lang, 'source' AS feature, source AS fv FROM documents
        UNION ALL
        SELECT lang, 'id_parity' AS feature,
               CAST(doc_id % 2 AS VARCHAR) AS fv
        FROM documents
    ), cells AS (
        SELECT feature, fv, lang, CAST(count(*) AS BIGINT) AS nij
        FROM base GROUP BY 1, 2, 3
    ), g AS (
        SELECT feature,
               list_sort(list(struct_pack(fv := fv, lang := lang,
                                          nij := nij))) AS l_joint,
               CAST(sum(nij) AS BIGINT) AS n_docs
        FROM cells GROUP BY feature
    ), rf AS (
        SELECT feature, fv, CAST(sum(nij) AS BIGINT) AS af
        FROM cells GROUP BY feature, fv
    ), gf AS (
        SELECT feature, list_sort(list(struct_pack(fv := fv, af := af)))
                   AS l_f
        FROM rf GROUP BY feature
    ), rl AS (
        SELECT feature, lang, CAST(sum(nij) AS BIGINT) AS al
        FROM cells GROUP BY feature, lang
    ), gl AS (
        SELECT feature, list_sort(list(struct_pack(lang := lang, al := al)))
                   AS l_l
        FROM rl GROUP BY feature
    ), h AS (
        SELECT g.feature, n_docs,
               {_mi_fold_sql('l_f', 'af')} AS h_f,
               {_mi_fold_sql('l_l', 'al')} AS h_l,
               {_mi_fold_sql('l_joint', 'nij')} AS h_fl
        FROM g JOIN gf ON g.feature = gf.feature
               JOIN gl ON g.feature = gl.feature
    )
    SELECT feature, n_docs,
           round(h_f, 6) + 0.0 AS h_feature,
           round(h_l, 6) + 0.0 AS h_label,
           round(h_f + h_l - h_fl, 6) + 0.0 AS mutual_info,
           round((h_f + h_l - h_fl) / nullif((h_f + h_l) / 2, 0), 6)
               + 0.0 AS nmi
    FROM h
    """,
)
def feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; lang) for three candidate features —
    the document-length band, the source, and a doc_id-parity CONTROL
    (independent by construction, so its MI pins the estimation noise
    floor) — the filter-style feature-relevance ranking run before
    training any classifier on corpus metadata, and the generalization of
    lang_agreement_nmi from one fixed clustering to a feature sweep.

    Determinism: every entropy is a SORTED fold over its own
    bounded-cardinality list (cells are capped by band × lang × feature
    cardinalities, never by fact rows) with identical ln() inputs on both
    engines (entropy_fold discipline); MI and its arithmetic-mean NMI
    normalizer round once at the end.

    Plan: the three feature columns stack into ONE corpus pass (stack()
    lowers to a Generate — one scan feeds all three features, the same
    idea as dq_column_profile's Expand), then one (feature, fv, lang)
    aggregation; everything after runs on category-bounded relations
    with broadcast joins on feature."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        F.expr(
            f"stack(3, "
            f"'len_band', CAST(least(n_chars DIV {_MI_LEN_BIN}, "
            f"{_MI_LEN_BINS - 1}) AS STRING), "
            f"'source', source, "
            f"'id_parity', CAST(doc_id % 2 AS STRING)) AS (feature, fv)"
        ),
    )
    cells = base.groupBy("feature", "fv", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    cells = cells.persist()
    cells.count()
    g = cells.groupBy("feature").agg(
        F.sort_array(F.collect_list(F.struct("fv", "lang", "nij"))).alias(
            "l_joint"
        ),
        F.sum("nij").cast("long").alias("n_docs"),
    )
    gf = (
        cells.groupBy("feature", "fv")
        .agg(F.sum("nij").cast("long").alias("af"))
        .groupBy("feature")
        .agg(F.sort_array(F.collect_list(F.struct("fv", "af"))).alias("l_f"))
    )
    gl = (
        cells.groupBy("feature", "lang")
        .agg(F.sum("nij").cast("long").alias("al"))
        .groupBy("feature")
        .agg(
            F.sort_array(F.collect_list(F.struct("lang", "al"))).alias("l_l")
        )
    )
    h = (
        g.join(F.broadcast(gf), "feature")
        .join(F.broadcast(gl), "feature")
        .select(
            "feature",
            "n_docs",
            F.expr(_mi_fold("l_f", "af")).alias("h_f"),
            F.expr(_mi_fold("l_l", "al")).alias("h_l"),
            F.expr(_mi_fold("l_joint", "nij")).alias("h_fl"),
        )
    )
    return h.select(
        "feature",
        "n_docs",
        (F.round("h_f", 6) + F.lit(0.0)).alias("h_feature"),
        (F.round("h_l", 6) + F.lit(0.0)).alias("h_label"),
        (F.round(F.col("h_f") + F.col("h_l") - F.col("h_fl"), 6) + F.lit(0.0)).alias(
            "mutual_info"
        ),
        (
            F.round(
                (F.col("h_f") + F.col("h_l") - F.col("h_fl"))
                / F.nullif(
                    (F.col("h_f") + F.col("h_l")) / F.lit(2.0), F.lit(0.0)
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("nmi"),
    )


# --------------------------------------------------------------------------
# Leave-one-source-out influence: how much each source moves the corpus
# mean quality — the cheapest data-valuation number.
# --------------------------------------------------------------------------
@query(
    "loso_source_influence",
    oracle="""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS t
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_all,
               CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS t_all
        FROM per
    )
    SELECT per.source, per.n AS n_docs,
           per.t / per.n AS source_mean_chars,
           tot.t_all / tot.n_all AS corpus_mean_chars,
           (tot.t_all - per.t) / (tot.n_all - per.n)
             - tot.t_all / tot.n_all AS loso_delta
    FROM per CROSS JOIN tot
    """,
)
def loso_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on the corpus mean document length:
    for each source, how the corpus mean WOULD move if that source were
    dropped — delta = (T − t_s)/(N − n_s) − T/N, the cheapest
    data-valuation number (the exact group-level form of
    leave-one-out influence; crosssource_backoff_score is the LM-loss
    sibling). A strongly negative delta says the source props the mean
    up; sources rank by |delta| for curation attention.

    Exactness: per-source counts and totals are exact integers/DECIMAL
    sums cast once; each reported value is a pinned quotient chain —
    closed-form algebra on group totals, NO per-source re-scan (the
    naive LOSO loop would rescan the corpus |sources| times; the
    identity makes it one pass).

    Plan: one source-keyed pass, a 1-row total, a broadcast cross join —
    scan-bound at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE)"
        ).alias("t"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.expr("CAST(sum(CAST(t AS DECIMAL(38,6))) AS DOUBLE)").alias("t_all"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.expr("t / n").alias("source_mean_chars"),
        F.expr("t_all / n_all").alias("corpus_mean_chars"),
        F.expr("(t_all - t) / (n_all - n) - t_all / n_all").alias(
            "loso_delta"
        ),
    )


# --------------------------------------------------------------------------
# Differential-privacy sensitivity audit: the numbers a DP release of the
# per-event-type statistics would have to calibrate noise against.
# --------------------------------------------------------------------------
@query(
    "privacy_dp_sensitivity_audit",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(count(*) AS BIGINT) AS n_ev,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS val_cents
        FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(max(n_ev) AS BIGINT) AS linf_count_sensitivity,
           CAST(max(abs(val_cents)) AS BIGINT) AS linf_value_sensitivity_cents,
           CAST(max(n_ev) AS DOUBLE) AS laplace_b_eps1
    FROM per_user GROUP BY event_type
    """,
)
def privacy_dp_sensitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level differential-privacy sensitivity audit for the
    per-event-type count and value-sum releases: before adding Laplace/
    Gaussian noise, a DP pipeline must know how much ONE user can move
    each statistic — max events a single user contributes to the cell
    (the L-inf count sensitivity, = the contribution bound you would
    clip to) and the max absolute per-user value mass in integer cents
    (the value-sum sensitivity). ``laplace_b_eps1`` is the Laplace scale
    b = sensitivity/epsilon at epsilon = 1 — the noise magnitude the
    release pays if it does NOT clip, which is exactly the argument for
    contribution bounding that these measured maxima quantify.

    Exactness: per-(user, type) tallies and cent sums are exact
    integers; the only double is one cast of an integer maximum.

    Plan: one (event_type, user_id)-keyed aggregation with map-side
    partials (the fact-row pass), then a per-type rollup over
    user-cardinality rows — the standard two-level DP accounting shape
    that never collects per-user data to the driver."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("val_cents"),
    )
    return per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.max("n_ev").cast("long").alias("linf_count_sensitivity"),
        F.max(F.abs("val_cents"))
        .cast("long")
        .alias("linf_value_sensitivity_cents"),
        F.max("n_ev").cast("double").alias("laplace_b_eps1"),
    )
