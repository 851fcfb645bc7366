"""Sessionization, interval analytics, distribution summaries, and a
deterministic iterative graph rank — the batch event-analytics surface a
training-data/telemetry pipeline layers over the relational core.

Engine-surface extensions (no direct reference counterpart; SURVEY §7
phases 4-5 scope). Every query here keeps the driver contract: scalar
output columns, identical aliases on both engines, and numeric paths that
are bit-reproducible across Spark and DuckDB (integer bucket math per
functions/timeutil.py; IEEE division is exact-rounded so ratio scores
match; no transcendental functions in hashed output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import SQL_TOKENS, tokens
from ..registry import query
from ..sources.parquet import load_table

_NS = 1_000_000_000
_GAP_S = 1800  # 30-minute session gap

_SQL_TOKS = SQL_TOKENS.format(expr="text")


@query(
    "sessionize_events",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_ns(ts) AS tns, value FROM events
    ), flagged AS (
        SELECT user_id, event_id, tns, value,
               CASE WHEN lag(tns) OVER w IS NULL
                         OR tns - lag(tns) OVER w > {_GAP_S * _NS}
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
    ), sess AS (
        SELECT user_id, tns, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           CAST(min(tns) // {_NS} AS BIGINT) AS start_s,
           CAST((max(tns) - min(tns)) // {_NS} AS BIGINT) AS duration_s,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity splits a session): the
    batch twin of ``session_window`` — lag() flags gap starts, a running sum
    numbers sessions, then one per-session aggregate.

    Plan shape: both window functions share ONE partitioning (user_id) and
    ordering (ts, event_id), so Spark plans a single shuffle + single sort;
    the final groupBy on (user_id, session_seq) is partial-aggregatable on
    the same keys. At 100 TB the shuffle key is user_id — cardinality grows
    with the user base, so spread stays even; no global sort anywhere.
    ``event_id`` breaks ts ties to keep session numbering deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > _GAP_S * _NS),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("__min_ts"),
            F.max("ts").alias("__max_ts"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            F.expr(f"__min_ts div {_NS}").alias("start_s"),
            F.expr(f"(__max_ts - __min_ts) div {_NS}").alias("duration_s"),
            "total_value",
        )
    )


@query(
    "concurrent_intervals",
    oracle="""
    WITH spans AS (
        SELECT CAST(o.o_orderdate AS DATE) AS start_d,
               CAST(max(l.l_shipdate) AS DATE) AS end_d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ), deltas AS (
        SELECT start_d AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT end_d AS d, -1 AS delta FROM spans
    ), daily AS (
        SELECT d, sum(delta) AS net FROM deltas GROUP BY d
    )
    SELECT d,
           CAST(net AS BIGINT) AS net_change,
           CAST(sum(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS open_orders
    FROM daily
    """,
)
def concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are in flight each day — interval-overlap counting
    WITHOUT a range join: each order's span [orderdate, last shipdate)
    becomes a +1/-1 boundary event, a per-day aggregate collapses the
    timeline to O(#distinct days), and one running sum yields concurrency.

    The classic scale trap here is the O(intervals × days) range join; the
    sweep-line form is O(intervals) + a window over the day-level timeline.
    The final window orders a single partition, but only AFTER the groupBy
    reduced cardinality to #days (~2.5k for 7 years) — a deliberate,
    bounded single-reducer step, not a data-volume sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__end_ts"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderdate").cast("date").alias("start_d"),
            F.col("__end_ts").cast("date").alias("end_d"),
        )
    )
    deltas = spans.select(F.col("start_d").alias("d"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("end_d").alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d",
        F.col("net").cast("long").alias("net_change"),
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


_H_LO = 900.0
_H_W = 5205.0  # (105000 - 900) / 20
_H_NB = 20


@query(
    "histogram_equi_width",
    oracle=f"""
    WITH b AS (
        SELECT least(greatest(CAST(floor((l_extendedprice - {_H_LO}) / {_H_W})
                                   AS INTEGER), 0), {_H_NB - 1}) AS bucket_id,
               l_extendedprice AS p
        FROM lineitem
    )
    -- CAST AS DOUBLE: the numeric literals make DuckDB fold this to
    -- DECIMAL(25,1) (pandas object/Decimal) while Spark emits double.
    SELECT bucket_id,
           CAST(round({_H_LO} + bucket_id * {_H_W}, 2) AS DOUBLE) AS lo_edge,
           count(*) AS n,
           round(min(p), 2) AS min_price,
           round(max(p), 2) AS max_price
    FROM b
    GROUP BY bucket_id
    """,
)
def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 buckets over a fixed price domain) — the
    distribution-profiling primitive. Bucket assignment is one scan-stage
    projection (IEEE double division + floor, exact-rounded and identical
    across engines); the groupBy keys on ≤20 buckets with map-side partial
    aggregation, so the shuffle carries ≤20 rows per task regardless of
    input size. Clamp via least/greatest makes the edges total."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.greatest(
            F.floor((F.col("l_extendedprice") - _H_LO) / _H_W).cast("int"), F.lit(0)
        ),
        F.lit(_H_NB - 1),
    )
    return (
        li.select(bucket.alias("bucket_id"), F.col("l_extendedprice").alias("p"))
        .groupBy("bucket_id")
        .agg(
            F.round(F.lit(_H_LO) + F.col("bucket_id") * _H_W, 2).alias("lo_edge"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p"), 2).alias("min_price"),
            F.round(F.max("p"), 2).alias("max_price"),
        )
        .select("bucket_id", "lo_edge", "n", "min_price", "max_price")
    )


@query(
    "quality_decile_mix",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
        FROM documents
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM ranked
    GROUP BY decile
    """,
)
def quality_decile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of a per-document quality proxy (length), the shape
    behind mix-rebalancing a training corpus: band by score decile, then
    inspect/ reweight each band. ntile over (score, doc_id) is exact and
    deterministic; both engines use the SQL-standard larger-groups-first
    fill. Note for 100 TB: a global ntile is a total sort — at that scale
    the same banding comes from approx_percentile cut points applied as a
    scan-stage CASE (see approx_percentile_sketch); the exact form here is
    the oracle-checkable contract."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    ranked = docs.select("doc_id", "n_chars", F.ntile(10).over(w).alias("decile"))
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


_PR_R0 = 1_000_000_000  # initial rank, scaled integer
_PR_TELEPORT = 150_000_000  # (1 - d) * scale with d = 0.85


def _pr_iter_sql(prev: str, this: str) -> str:
    return f"""{this} AS (
        SELECT n.node,
               CAST({_PR_TELEPORT} + (85 * coalesce(sum(r.rank // d.outdeg), 0)) // 100
                    AS BIGINT) AS rank
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} r ON r.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.node
    )"""


@query(
    "pagerank_integer",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), deg AS (
        SELECT src, count(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
        SELECT node, CAST({_PR_R0} AS BIGINT) AS rank FROM nodes
    ), {_pr_iter_sql("r0", "r1")}, {_pr_iter_sql("r1", "r2")}, {_pr_iter_sql("r2", "r3")}
    SELECT node, rank AS rank_scaled FROM r3
    """,
)
def pagerank_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled PageRank iterations (d=0.85) over the nation-level
    trade graph (customer nation → supplier nation), in SCALED INTEGER
    arithmetic: rank starts at 1e9, each step is
    ``teleport + (85 * Σ incoming(rank div outdeg)) div 100`` — every
    operation exact 64-bit integer math, so Spark and DuckDB agree
    bit-for-bit (float PageRank would drift with summation order).

    Plan shape: the expensive part is the edge build (fact-fact join with
    broadcast dims — same shape as q7); after DISTINCT the graph is ≤ V²
    nation pairs, so each iteration is a broadcast join + tiny agg.
    localCheckpoint truncates the edge lineage so 3 iterations don't
    re-run the 4-way join (same iterative-control pattern as
    operators/dedup.py connected components). Dangling-node rank leaks,
    as in the classic simplified formulation — identical on both sides."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(_PR_R0).cast("long").alias("rank"))
    # The rank/degree/message tables are ≤ V rows by construction (nation
    # graph) — hint broadcast explicitly: a localCheckpoint'd table has no
    # stats, so without hints Catalyst falls back to sort-merge joins.
    for _ in range(3):
        incoming = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node"])
            .join(F.broadcast(deg), "src")
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = nodes.join(
            F.broadcast(incoming), nodes["node"] == incoming["dst"], "left"
        ).select(
            "node",
            F.expr(
                f"cast({_PR_TELEPORT} + (85 * coalesce(inc, 0)) div 100 as long)"
            ).alias("rank"),
        )
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_SQL_TOKS}) AS token FROM documents
    ), tf AS (
        SELECT source, token, count(*) AS tf FROM tok GROUP BY source, token
    ), dfreq AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), n AS (
        SELECT count(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.source, tf.token, tf.tf, dfreq.df,
               round(tf.tf * n.n_docs / CAST(dfreq.df AS DOUBLE), 6) AS score
        FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ), ranked AS (
        SELECT source, token, tf, df, score,
               row_number() OVER (PARTITION BY source
                                  ORDER BY score DESC, token) AS rn
        FROM scored
    )
    SELECT source, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           score, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source characteristic terms: tf × (N/df) ratio weighting, top 5
    per source. Uses the raw inverse-document-frequency RATIO rather than
    its logarithm — rank order differs from log-idf, but the score is one
    exact IEEE division (bit-identical across engines) where ln() is
    libm-dependent; chosen deliberately so the result hashes.

    Plan (round 8, guide §2.4): ONE tokenize pass. The old plan fed the
    exploded relation into two separate aggregations (tf by (source,
    token), df by (token, distinct doc)) and joined them back on token —
    Catalyst does not share scans across subtrees, so the tokenizer ran
    TWICE and the join re-shuffled tf by token. Here one (token, doc_id)
    pre-aggregation (a document's source is a doc-level attribute, so
    the grain determines source) feeds a count() window over token for
    df — each row IS one distinct (token, doc) — and the (source, token)
    rollup sums tf; same exact integers, one lineage, no join. Broadcast
    the 1-row corpus count → per-source top-k via WindowGroupLimit
    (rank filter pushes the limit into the sort). (score, token) gives a
    total order, so top-5 is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    perdoc = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.max("source").alias("source")
    )
    wdf = perdoc.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
    )
    tfdf = wdf.groupBy("source", "token").agg(
        F.sum("c").alias("tf"), F.max("df").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tfdf.crossJoin(F.broadcast(n)).select(
        "source",
        "token",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "token", "tf", "df", "score", "rn")
    )


_WEEK_NS = 604_800 * _NS


@query(
    "retention_cohorts",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_ns(ts) // {_WEEK_NS} AS week FROM events
    ), cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
    )
    SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
           CAST(e.week - c.cohort_week AS BIGINT) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           count(*) AS n_events
    FROM e JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week, then
    distinct-user counts per (cohort, weeks-since-cohort) — the standard
    product-analytics triangle a telemetry warehouse serves every day.

    Week boundaries are integer nanosecond division (timezone-proof,
    identical on both engines). Plan: one user-grain aggregation for the
    cohort table, then a join back keyed on user_id — high cardinality,
    even spread, and AQE co-partitions both sides on the same key so the
    join reuses the aggregation's shuffle. The final rollup keys on the
    tiny (cohort, offset) pair with map-side partials."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts div {_WEEK_NS}").alias("week")
    )
    cohorts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(cohorts, "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week")).cast("long").alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_DAY_NS = 86_400 * _NS
RAU_WINDOW_DAYS = 7


@query(
    "rolling_active_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_DAY_NS} AS day FROM events
    ), bounds AS (
        SELECT min(day) AS lo, max(day) AS hi FROM ud
    ), contrib AS (
        SELECT user_id,
               unnest(generate_series(day, day + {RAU_WINDOW_DAYS - 1})) AS w_day
        FROM ud
    ), dedup AS (
        SELECT DISTINCT user_id, w_day FROM contrib
    )
    SELECT CAST(d.w_day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS active_users_7d
    FROM dedup d, bounds b
    WHERE d.w_day BETWEEN b.lo AND b.hi
    GROUP BY d.w_day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the WAU curve). Spark
    has no count-distinct-over-RANGE-window, so this uses the idiomatic
    explode-to-window form: each (user, active-day) pair contributes to
    the 7 window end-days it falls inside, the contributions dedupe on
    (user, window-day), and a plain count per day finishes — distinct
    semantics without any window function at all.

    Scale: the explode multiplies the USER-DAY grain (already reduced
    from raw events) by the window length, not the event count; both
    dedup and count are partial-aggregatable shuffles on high-cardinality
    keys. Day boundaries are integer nanosecond division. The report is
    clipped to days inside the observed range so both engines agree on
    the frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts div {_DAY_NS}").alias("day")
    )
    ud = ev.distinct()
    bounds = ud.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + (RAU_WINDOW_DAYS - 1))
        ).alias("w_day"),
    ).distinct()
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("w_day").between(F.col("lo"), F.col("hi")))
        .groupBy(F.col("w_day").cast("long").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("active_users_7d"))
    )


# --------------------------------------------------------------------------
# Last-touch attribution: purchases credited to the most recent preceding
# marketing touch (click/view) within a lookback window.
# --------------------------------------------------------------------------
ATTR_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # 7-day attribution window


@query(
    "attribution_last_touch",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), touched AS (
        SELECT user_id, event_id, event_type, ts_us,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN ts_us END IGNORE NULLS) OVER w AS t_ts,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS) OVER w AS t_type
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN t_ts IS NOT NULL
                     AND ts_us - t_ts <= {ATTR_LOOKBACK_US}
                THEN t_type ELSE 'none' END AS touch_type,
           count(*) AS n_purchases,
           CAST(coalesce(sum(CASE WHEN t_ts IS NOT NULL
                         AND ts_us - t_ts <= {ATTR_LOOKBACK_US}
                    THEN ts_us - t_ts END), 0) AS BIGINT) AS total_lag_us
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY touch_type
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent preceding click/view within a 7-day lookback
    ('none' when no touch qualifies). The running ``last(ignorenulls)``
    carries the touch's timestamp and type from the SAME qualifying row
    (both windows share one frame), so the lookback check is a plain
    post-window predicate.

    Plan shape: ONE user_id exchange serves both last() windows (shared
    partition+sort spec); the channel rollup then shuffles a 3-key
    relation. No self-join, no inequality join — the same running-window
    as-of composition as asof_join_tolerance (joins_ext.py)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("t_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("t_type"),
    )
    fresh = F.col("t_ts").isNotNull() & (
        (F.col("ts_us") - F.col("t_ts")) <= ATTR_LOOKBACK_US
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            F.when(fresh, F.col("t_type")).otherwise(F.lit("none")).alias(
                "touch_type"
            ),
            F.when(fresh, F.col("ts_us") - F.col("t_ts")).alias("lag_us"),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.coalesce(F.sum("lag_us"), F.lit(0)).cast("long").alias(
                "total_lag_us"
            ),
        )
    )


# --------------------------------------------------------------------------
# Equi-depth histogram: quantile binning (the complement of the
# equi-width histogram above; what a feature-binning / stats-collection
# pass actually wants for skewed money-like columns).
# --------------------------------------------------------------------------
_EQD_BINS = 8


def _eqd_oracle() -> str:
    fracs = ", ".join(f"{k}/{_EQD_BINS}.0" for k in range(1, _EQD_BINS))
    binexpr = " + ".join(
        f"CAST(cents > bs[{k}] AS INT)" for k in range(1, _EQD_BINS)
    )
    return f"""
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), b AS (
        SELECT quantile_cont(cents, [{fracs}]) AS bs FROM c
    )
    SELECT ({binexpr}) AS bin,
           count(*) AS n_rows,
           min(cents) AS lo_cents,
           max(cents) AS hi_cents
    FROM c CROSS JOIN b
    GROUP BY bin
    """


@query("histogram_equi_depth", oracle=_eqd_oracle())
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of extended price in 8 bins: bin
    boundaries are the exact k/8 quantiles, row assignment counts how
    many boundaries the value exceeds. Values quantize to integer cents
    first, so the linearly-interpolated boundaries land on exact
    multiples of 1/8 cent and every boundary comparison is between
    exactly-representable doubles — identical on both engines (the
    mad_robust_outliers determinism discipline).

    Plan shape: one exact-percentile aggregation produces the 7-value
    boundary row (exact percentile holds the column's values ONCE — at
    unbounded scale swap approx_percentile, same contract as
    percentile_agg); the single-row boundary table broadcasts back onto
    the scan; the bin rollup is an 8-key aggregate. No window, no sort,
    no fact-sized join."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    # ONE array-percentile aggregate: all 7 boundaries share a single
    # per-partition value buffer (7 scalar percentile() aggs each buffer
    # the whole column — measured 7x slower at sf0.1)
    bounds = c.agg(
        F.percentile(
            "cents",
            F.array(*[F.lit(k / _EQD_BINS) for k in range(1, _EQD_BINS)]),
        ).alias("bs")
    )
    binned = c.crossJoin(F.broadcast(bounds)).select(
        sum(
            [
                (F.col("cents") > F.col("bs")[k - 1]).cast("int")
                for k in range(1, _EQD_BINS)
            ],
            F.lit(0),
        ).alias("bin"),
        "cents",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


# Scale-mode twin: equi-depth binning from sketch boundaries.
_EQD_TOL = 0.05  # per-bin mass tolerance (sketch rank error ~1e-4 << this)


def _eqd_approx_oracle() -> str:
    # decimal literals, not k/8.0 expressions: DuckDB's list-valued
    # approx_quantile binds FLOAT[], and a DOUBLE[] expression list has no
    # implicit downcast; k/8 literals are dyadic so FLOAT holds them exact
    fracs = ", ".join(str(k / _EQD_BINS) for k in range(1, _EQD_BINS))
    binexpr = " + ".join(
        f"CAST(cents > bs[{k}] AS INT)" for k in range(1, _EQD_BINS)
    )
    return f"""
    WITH c AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), b AS (
        SELECT approx_quantile(cents, [{fracs}]) AS bs FROM c
    ), t AS (SELECT count(*) AS n_total FROM c),
    pb AS (
        SELECT ({binexpr}) AS bin, count(*) AS n
        FROM c CROSS JOIN b
        GROUP BY bin
    )
    SELECT bin, n_total,
           CAST(abs(n - n_total / {_EQD_BINS}.0)
                <= n_total * {_EQD_TOL} AS INT) AS equi_depth_ok
    FROM pb CROSS JOIN t
    """


@query("histogram_equi_depth_approx", oracle=_eqd_approx_oracle())
def histogram_equi_depth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-mode twin of histogram_equi_depth: bin boundaries come from
    approx_percentile — the mergeable sketch whose state is O(accuracy),
    not O(column), i.e. the boundary build actually run at 100x. Sketch
    boundaries are engine-specific, so per-bin counts cannot be compared
    directly; the cross-engine contract is the equi-depth property
    itself — each engine asserts its own bins each hold n/8 of the rows
    within a {_EQD_TOL:.0%} mass tolerance (sketch rank error is ~1e-4,
    orders of magnitude inside it). bin ids and the exact total row
    count stay engine-invariant."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    bounds = c.agg(
        F.percentile_approx(
            "cents",
            F.array(*[F.lit(k / _EQD_BINS) for k in range(1, _EQD_BINS)]),
            10000,
        ).alias("bs")
    )
    tot = c.agg(F.count(F.lit(1)).alias("n_total"))
    binned = c.crossJoin(F.broadcast(bounds)).select(
        sum(
            [
                (F.col("cents") > F.col("bs")[k - 1]).cast("int")
                for k in range(1, _EQD_BINS)
            ],
            F.lit(0),
        ).alias("bin")
    )
    pb = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    return pb.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_total",
        (
            F.abs(F.col("n") - F.col("n_total") / float(_EQD_BINS))
            <= F.col("n_total") * _EQD_TOL
        )
        .cast("int")
        .alias("equi_depth_ok"),
    )


# --------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quartile scores per
# customer, rolled up per segment — the classic behavioral cut, scored
# with the same exactly-representable quartile-boundary discipline as
# histogram_equi_depth (never ntile, whose tie assignment is
# order-dependent).
# --------------------------------------------------------------------------
_DAY_US = 86_400_000_000


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), cust AS (
        SELECT o_custkey,
               max(day) AS last_day,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS m_cents
        FROM o GROUP BY o_custkey
    ), ref AS (SELECT max(last_day) AS ref_day FROM cust),
    feats AS (
        SELECT c.*, r.ref_day - c.last_day AS rec_days
        FROM cust c CROSS JOIN ref r
    ), b AS (
        SELECT quantile_cont(rec_days, [0.25, 0.5, 0.75]) AS br,
               quantile_cont(n_orders, [0.25, 0.5, 0.75]) AS bf,
               quantile_cont(m_cents,  [0.25, 0.5, 0.75]) AS bm
        FROM feats
    ), scored AS (
        SELECT f.o_custkey, f.m_cents,
               CAST(f.rec_days > b.br[1] AS INT) + CAST(f.rec_days > b.br[2] AS INT)
                 + CAST(f.rec_days > b.br[3] AS INT) AS r_s,
               CAST(f.n_orders > b.bf[1] AS INT) + CAST(f.n_orders > b.bf[2] AS INT)
                 + CAST(f.n_orders > b.bf[3] AS INT) AS f_s,
               CAST(f.m_cents > b.bm[1] AS INT) + CAST(f.m_cents > b.bm[2] AS INT)
                 + CAST(f.m_cents > b.bm[3] AS INT) AS m_s
        FROM feats f CROSS JOIN b
    )
    SELECT 'R' || CAST(r_s AS VARCHAR) || 'F' || CAST(f_s AS VARCHAR)
               || 'M' || CAST(m_s AS VARCHAR) AS segment,
           count(*) AS n_customers,
           CAST(sum(m_cents) AS BIGINT) AS total_cents
    FROM scored
    GROUP BY segment
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order,
    against the corpus max), frequency (order count), monetary (total
    cents); each scored 0-3 by how many exact quartile boundaries it
    exceeds, then rolled up per 'R{{r}}F{{f}}M{{m}}' segment. Quartile
    fractions k/4 are binary-exact, inputs are integers, so interpolated
    boundaries — and every comparison — evaluate identically on both
    engines; ntile() would instead split ties by partition order.

    Plan shape: one o_custkey aggregation over orders (fact-scale
    shuffle #1 and the only one); the 1-row reference day and the 1-row
    boundary triple both come back via broadcast; the segment rollup has
    ≤64 keys. Exact quantile_cont buffers CUSTOMER-grain rows — at
    unbounded customer counts swap approx_percentile (percentile_agg
    contract)."""
    orders = load_table(spark, sf_dir, "orders")
    # datediff over CAST-to-date works for both TIMESTAMP and
    # TIMESTAMP_NTZ fixture generations (unix_micros rejects NTZ)
    o = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = o.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("m_cents"),
    )
    ref = cust.agg(F.max("last_day").alias("ref_day"))
    feats = cust.crossJoin(F.broadcast(ref)).withColumn(
        "rec_days", F.col("ref_day") - F.col("last_day")
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    b = feats.agg(
        F.percentile("rec_days", qs).alias("br"),
        F.percentile("n_orders", qs).alias("bf"),
        F.percentile("m_cents", qs).alias("bm"),
    )

    def _score(col: str, bs: str):
        return sum(
            [(F.col(col) > F.col(bs)[k]).cast("int") for k in range(3)],
            F.lit(0),
        )

    scored = feats.crossJoin(F.broadcast(b)).select(
        "m_cents",
        _score("rec_days", "br").alias("r_s"),
        _score("n_orders", "bf").alias("f_s"),
        _score("m_cents", "bm").alias("m_s"),
    )
    return (
        scored.select(
            F.concat(
                F.lit("R"), F.col("r_s").cast("string"),
                F.lit("F"), F.col("f_s").cast("string"),
                F.lit("M"), F.col("m_s").cast("string"),
            ).alias("segment"),
            "m_cents",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m_cents").cast("long").alias("total_cents"),
        )
    )

# Scale-mode twin: RFM scoring from sketch quartiles.
_RFM_EPS = 0.03


@query(
    "customer_rfm_segments_approx",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), cust AS (
        SELECT o_custkey,
               max(day) AS last_day,
               count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS m_cents
        FROM o GROUP BY o_custkey
    ), ref AS (SELECT max(last_day) AS ref_day FROM cust),
    feats AS (
        SELECT c.*, r.ref_day - c.last_day AS rec_days
        FROM cust c CROSS JOIN ref r
    ), b AS (
        SELECT approx_quantile(rec_days, [0.25, 0.5, 0.75]) AS br,
               approx_quantile(n_orders, [0.25, 0.5, 0.75]) AS bf,
               approx_quantile(m_cents,  [0.25, 0.5, 0.75]) AS bm,
               quantile_cont(rec_days, [{0.25 - _RFM_EPS}, {0.5 - _RFM_EPS},
                                        {0.75 - _RFM_EPS}, {0.25 + _RFM_EPS},
                                        {0.5 + _RFM_EPS}, {0.75 + _RFM_EPS}])
                   AS br_bd,
               quantile_cont(m_cents, [{0.25 - _RFM_EPS}, {0.5 - _RFM_EPS},
                                       {0.75 - _RFM_EPS}, {0.25 + _RFM_EPS},
                                       {0.5 + _RFM_EPS}, {0.75 + _RFM_EPS}])
                   AS bm_bd
        FROM feats
    ), scored AS (
        SELECT f.o_custkey, f.m_cents,
               CAST(f.rec_days > b.br[1] AS INT) + CAST(f.rec_days > b.br[2] AS INT)
                 + CAST(f.rec_days > b.br[3] AS INT) AS r_s,
               CAST(f.n_orders > b.bf[1] AS INT) + CAST(f.n_orders > b.bf[2] AS INT)
                 + CAST(f.n_orders > b.bf[3] AS INT) AS f_s,
               CAST(f.m_cents > b.bm[1] AS INT) + CAST(f.m_cents > b.bm[2] AS INT)
                 + CAST(f.m_cents > b.bm[3] AS INT) AS m_s
        FROM feats f CROSS JOIN b
    ), seg AS (
        SELECT 'R' || CAST(r_s AS VARCHAR) || 'F' || CAST(f_s AS VARCHAR)
                   || 'M' || CAST(m_s AS VARCHAR) AS segment,
               count(*) AS n_customers,
               CAST(sum(m_cents) AS BIGINT) AS total_cents
        FROM scored GROUP BY segment
    )
    SELECT CAST(sum(n_customers) AS BIGINT) AS n_customers,
           CAST(sum(total_cents) AS BIGINT) AS total_cents,
           (SELECT CAST(br[1] BETWEEN br_bd[1] AND br_bd[4] AS INT)
                 + CAST(br[2] BETWEEN br_bd[2] AND br_bd[5] AS INT)
                 + CAST(br[3] BETWEEN br_bd[3] AND br_bd[6] AS INT)
            FROM b) AS n_rec_bounds_ok,
           (SELECT CAST(bm[1] BETWEEN bm_bd[1] AND bm_bd[4] AS INT)
                 + CAST(bm[2] BETWEEN bm_bd[2] AND bm_bd[5] AS INT)
                 + CAST(bm[3] BETWEEN bm_bd[3] AND bm_bd[6] AS INT)
            FROM b) AS n_mon_bounds_ok
    FROM seg
    """,
)
def customer_rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-mode twin of customer_rfm_segments: quartile boundaries for
    all three features come from approx_percentile (O(accuracy) mergeable
    state — the boundary build run at unbounded customer counts), scoring
    and segment rollup unchanged. Sketch boundaries are engine-specific,
    so per-segment counts cannot be compared; the contract is (a)
    conservation — segment counts and money must sum back to the exact
    customer total and global cents total (forces the full scoring
    pipeline to execute), and (b) bounded rank error — each engine's
    recency and monetary quartiles inside its own exact q±3% bands
    (frequency is excluded from (b): small-integer order counts tie so
    heavily that exact rank bands collapse; its sketch still drives
    scoring and is covered by (a))."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = o.groupBy("o_custkey").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("m_cents"),
    )
    ref = cust.agg(F.max("last_day").alias("ref_day"))
    feats = cust.crossJoin(F.broadcast(ref)).withColumn(
        "rec_days", F.col("ref_day") - F.col("last_day")
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    # one array aggregate per feature carries all 6 band edges (3 lo, 3 hi)
    qs_bd = F.array(
        *[F.lit(q - _RFM_EPS) for q in (0.25, 0.5, 0.75)],
        *[F.lit(q + _RFM_EPS) for q in (0.25, 0.5, 0.75)],
    )
    b = feats.agg(
        F.percentile_approx("rec_days", qs, 10000).alias("br"),
        F.percentile_approx("n_orders", qs, 10000).alias("bf"),
        F.percentile_approx("m_cents", qs, 10000).alias("bm"),
        F.percentile("rec_days", qs_bd).alias("br_bd"),
        F.percentile("m_cents", qs_bd).alias("bm_bd"),
    )

    def _score(col: str, bs: str):
        return sum(
            [(F.col(col) > F.col(bs)[k]).cast("int") for k in range(3)],
            F.lit(0),
        )

    def _bounds_ok(ap: str, bd: str):
        return sum(
            [
                F.col(ap)[k]
                .between(F.col(bd)[k], F.col(bd)[k + 3])
                .cast("int")
                for k in range(3)
            ],
            F.lit(0),
        )

    scored = feats.crossJoin(F.broadcast(b)).select(
        "m_cents",
        _score("rec_days", "br").alias("r_s"),
        _score("n_orders", "bf").alias("f_s"),
        _score("m_cents", "bm").alias("m_s"),
        _bounds_ok("br", "br_bd").alias("__rok"),
        _bounds_ok("bm", "bm_bd").alias("__mok"),
    )
    seg = scored.select(
        F.concat(
            F.lit("R"), F.col("r_s").cast("string"),
            F.lit("F"), F.col("f_s").cast("string"),
            F.lit("M"), F.col("m_s").cast("string"),
        ).alias("segment"),
        "m_cents",
        "__rok",
        "__mok",
    ).groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m_cents").cast("long").alias("total_cents"),
        F.max("__rok").alias("__rok"),
        F.max("__mok").alias("__mok"),
    )
    return seg.agg(
        F.sum("n_customers").cast("long").alias("n_customers"),
        F.sum("total_cents").cast("long").alias("total_cents"),
        F.max("__rok").cast("int").alias("n_rec_bounds_ok"),
        F.max("__mok").cast("int").alias("n_mon_bounds_ok"),
    )


# --------------------------------------------------------------------------
# Sequence-pattern matching (MATCH_RECOGNIZE-lite): click -> view* ->
# purchase, detected with running windows instead of a pattern automaton.
# --------------------------------------------------------------------------
@query(
    "event_pattern_match",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), runs AS (
        SELECT user_id, event_id, event_type, ts_us,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   OVER w AS v_run
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), carried AS (
        SELECT user_id, event_type, v_run,
               last_value(CASE WHEN event_type <> 'view'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS prev_nv_type,
               last_value(CASE WHEN event_type <> 'view'
                               THEN v_run END IGNORE NULLS)
                   OVER w AS prev_nv_vrun
        FROM runs
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(CASE WHEN prev_nv_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched_paths,
           CAST(coalesce(sum(CASE WHEN prev_nv_type = 'click'
                         THEN v_run - prev_nv_vrun END), 0) AS BIGINT)
               AS views_in_paths,
           CAST(coalesce(max(CASE WHEN prev_nv_type = 'click'
                         THEN v_run - prev_nv_vrun END), 0) AS BIGINT)
               AS max_path_views
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching without a pattern automaton: a purchase
    matches ``click (view)* purchase`` exactly when the most recent
    PRECEDING non-view event is a click (any intervening non-view breaks
    the run, so the definition is closed-form); the views inside each
    matched path fall out as the difference of running view counts at the
    purchase and at the carried click. Per user: purchases, matched
    paths, and total/max path view counts.

    This is the distributed answer to MATCH_RECOGNIZE-style funnels: two
    window passes over ONE (user_id) exchange (the running view count,
    then the carried last-non-view pair — same partition+sort spec, same
    frame, so the carried type and view-count come from the same row),
    a post-window predicate, and a user rollup. No self-join, no
    per-user automaton state, no quadratic pair scan — the
    attribution_last_touch composition applied to path counting; at
    100 TB the user-key partitioning spreads evenly and each row holds
    O(1) window state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runs = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("v_run"),
    )
    nonview = F.col("event_type") != "view"
    carried = runs.select(
        "user_id",
        "event_type",
        "v_run",
        F.last(F.when(nonview, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("prev_nv_type"),
        F.last(F.when(nonview, F.col("v_run")), ignorenulls=True)
        .over(w)
        .alias("prev_nv_vrun"),
    )
    matched = F.col("prev_nv_type") == "click"
    path_views = F.when(matched, F.col("v_run") - F.col("prev_nv_vrun"))
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(matched.cast("int")).cast("long").alias("n_matched_paths"),
            F.coalesce(F.sum(path_views), F.lit(0))
            .cast("long")
            .alias("views_in_paths"),
            F.coalesce(F.max(path_views), F.lit(0))
            .cast("long")
            .alias("max_path_views"),
        )
    )


# --------------------------------------------------------------------------
# Burstiness (Fano factor) of per-user event counts — exact rational form.
# --------------------------------------------------------------------------
@query(
    "events_user_burstiness",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, user_id
    ), m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM per_user GROUP BY event_type
    )
    SELECT event_type, n_users, s AS n_events,
           CAST(n_users * q - s * s AS DOUBLE)
               / CAST(n_users * s AS DOUBLE) AS fano
    FROM m
    """,
)
def events_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of per-user event counts, per
    event type — the burstiness diagnostic that separates Poisson-like
    traffic (fano ≈ 1) from bursty power-user skew (fano ≫ 1) and
    near-uniform quota traffic (fano < 1). The same number decides
    whether a per-user key is shuffle-safe or needs salting: fano IS a
    skew measurement on the grouping key, the quantitative backing for
    key_skew_hhi.

    Exactness: population variance/mean collapses to the single rational
    (n·Σc² − S²)/(n·S) — integer moments (the corr_exact discipline),
    one pinned IEEE division, bit-identical across engines. Overflow
    bound: n·Σc² stays under 2^63 until ~10^9 users × 10^4 events each;
    past that swap the moment accumulators to DECIMAL(38,0).

    Plan: two hash aggregations — fact rows → (type, user) partials →
    type-level moments; both combine map-side, and the second runs over
    user-cardinality rows, not events. Zero joins, zero windows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    return m.select(
        "event_type",
        "n_users",
        F.col("s").alias("n_events"),
        (
            (F.col("n_users") * F.col("q") - F.col("s") * F.col("s")).cast(
                "double"
            )
            / (F.col("n_users") * F.col("s")).cast("double")
        ).alias("fano"),
    )


# --------------------------------------------------------------------------
# Burst collapse: keep only the first event of each rapid-fire burst.
# --------------------------------------------------------------------------
BURST_TTL_NS = 24 * 3_600 * 1_000_000_000  # 24 hours


@query(
    "events_burst_collapse",
    oracle=f"""
    WITH o AS (
        SELECT event_type, user_id, epoch_ns(ts) AS tns, event_id
        FROM events
    ), lagged AS (
        SELECT event_type,
               tns - lag(tns) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY tns, event_id
               ) AS gap
        FROM o
    ), flagged AS (
        SELECT event_type,
               CASE WHEN gap IS NULL OR gap > {BURST_TTL_NS}
                    THEN 1 ELSE 0 END AS keep
        FROM lagged
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(keep) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(keep) AS BIGINT) AS n_collapsed,
           CAST(CAST(sum(keep) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS keep_ratio
    FROM flagged GROUP BY event_type
    """,
)
def events_burst_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry burst dedup: within each (user, event_type) stream an
    event is kept only if it starts a burst — i.e. the previous same-key
    event is more than 24 hours older (repeat touches within a day
    collapse to their first occurrence — the at-most-daily dedup a
    notification or billing pipeline applies; the fixture's inter-arrival
    spectrum straddles this TTL, so both branches are exercised). This is the BATCH
    twin of the streaming dropDuplicatesWithinWatermark/state-TTL shape
    (stream_dedup_earliest) with burst semantics instead of exact-key
    semantics: a burst is defined by inter-arrival gap, not by equality,
    so it needs lag(), not a distinct.

    Exactness: gaps are int64 epoch-nanosecond differences with
    (tns, event_id) as the total order — no float time math anywhere;
    the keep_ratio division is the single float op.

    Plan: ONE (user_id, event_type)-keyed window (lag over the natural
    stream order — the exchange doubles as the session clustering), then
    a type-keyed rollup whose key space is tiny. State per row is O(1);
    at 100 TB the window partitions by user and never materializes a
    group larger than one user's stream — the same bound the streaming
    twin's state store relies on."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        (F.col("ts") - F.lag("ts").over(w)).alias("gap"),
    )
    flagged = lagged.select(
        "event_type",
        F.when(
            F.col("gap").isNull() | (F.col("gap") > BURST_TTL_NS), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("keep"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("keep").cast("long").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("long").alias("n_collapsed"),
        (
            F.sum("keep").cast("long").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("keep_ratio"),
    )


# --------------------------------------------------------------------------
# Two-proportion z-test: the A/B experiment readout, exact-integer inputs.
# --------------------------------------------------------------------------
@query(
    "ab_test_proportions",
    oracle="""
    WITH assign AS (
        SELECT DISTINCT user_id, user_id % 2 AS arm FROM events
    ), pc AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), thr AS (
        SELECT CAST(sum(n_purch) AS BIGINT)
               // (SELECT count(*) FROM assign) + 1 AS k
        FROM pc
    ), conv AS (
        SELECT user_id FROM pc CROSS JOIN thr WHERE n_purch >= thr.k
    ), cells AS (
        SELECT a.arm,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(c.user_id) AS BIGINT) AS n_converted
        FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
        GROUP BY a.arm
    ), wide AS (
        SELECT
            max(CASE WHEN arm = 0 THEN n_users END) AS n0,
            max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
            max(CASE WHEN arm = 1 THEN n_users END) AS n1,
            max(CASE WHEN arm = 1 THEN n_converted END) AS c1
        FROM cells
    )
    SELECT n0 AS n_control, c0 AS conv_control,
           n1 AS n_treat, c1 AS conv_treat,
           CAST(c0 AS DOUBLE) / n0 AS p_control,
           CAST(c1 AS DOUBLE) / n1 AS p_treat,
           (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / nullif(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)), 0.0) AS z_stat
    FROM wide
    """,
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A/B readout: users split into two arms by key parity (the
    deterministic stand-in for experiment assignment — swap in the real
    assignment column unchanged), converted = an above-average purchaser (count >= global
    purchases-per-user + 1 — a self-scaling threshold that cannot
    saturate the way raw >=1 does on a dense fixture);
    reported as the pooled two-proportion z statistic, the first number
    every experimentation platform computes. |z| > 1.96 is the familiar
    5% line; the inputs stay visible so any other test (chi-square,
    Fisher) can re-derive from the same four integers.

    Exactness: the entire test reduces to four exact integer cells
    (users and converters per arm); every subsequent op is a pinned
    IEEE expression over them — no float aggregation anywhere, so the
    statistic is bit-identical across engines and layouts.

    Plan: one distinct on (user, arm) (user-keyed), one distinct on
    converters, one user-keyed left join, a 2-row pivot. The join keys
    on user_id — co-partitioned with both distincts, and at 100 TB the
    whole thing is two scans of an event log plus user-cardinality
    state, the minimum for the question."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    pc = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purch"))
    )
    n_users = assign.agg(F.count(F.lit(1)).alias("nu"))
    thr = (
        pc.agg(F.sum("n_purch").cast("long").alias("tp"))
        .crossJoin(F.broadcast(n_users))
        .select((F.expr("tp div nu") + 1).alias("k"))
    )
    conv = (
        pc.crossJoin(F.broadcast(thr))
        .filter(F.col("n_purch") >= F.col("k"))
        .select("user_id")
        .withColumn("converted", F.lit(1))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("converted").cast("long").alias("n_converted"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    return wide.select(
        F.col("n0").alias("n_control"),
        F.col("c0").alias("conv_control"),
        F.col("n1").alias("n_treat"),
        F.col("c1").alias("conv_treat"),
        p0.alias("p_control"),
        p1.alias("p_treat"),
        (
            (p1 - p0)
            / F.nullif(
                F.sqrt(
                    pp
                    * (F.lit(1.0) - pp)
                    * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
                ),
                F.lit(0.0),
            )
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve: cumulative revenue per customer by cohort age.
# --------------------------------------------------------------------------
@query(
    "cohort_ltv_curve",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               (year(CAST(o_orderdate AS DATE)) * 12
                + month(CAST(o_orderdate AS DATE)) - 1) AS month_id,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), firsts AS (
        SELECT o_custkey, min(month_id) AS cohort FROM o GROUP BY o_custkey
    ), sized AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort
    ), aged AS (
        SELECT f.cohort, o.month_id - f.cohort AS age,
               CAST(sum(o.cents) AS BIGINT) AS cents
        FROM o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY f.cohort, age
    ), cum AS (
        SELECT cohort, age,
               CAST(sum(cents) OVER (
                   PARTITION BY cohort ORDER BY age) AS BIGINT) AS cum_cents
        FROM aged
    )
    SELECT c.cohort, c.age, s.cohort_size, c.cum_cents,
           CAST(c.cum_cents AS DOUBLE) / s.cohort_size
               AS ltv_cents_per_customer
    FROM cum c JOIN sized s USING (cohort)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue per cohort member at each cohort age —
    the money-side twin of retention_cohorts (which counts the USERS
    who come back; this accumulates what they SPEND). Reading down a
    column compares cohort quality at equal age — the payback-period
    and acquisition-quality readout every growth team maintains.

    Exactness: integer cents end-to-end; cumulative sums are integer
    window sums in age order; the single division per row normalizes by
    fixed cohort size (first-month membership, the standard LTV
    denominator — not survivors-at-age, which would inflate the tail).

    Plan: one customer-keyed first-order aggregation, one (cohort, age)
    rollup riding a customer-keyed join, then calendar²-bounded windows
    and the size lookup — after the two fact-scale passes everything is
    cohort-month-sized. The cumulative window partitions BY COHORT, so
    no single-partition global sort ever appears."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate")) * 12 + F.month(F.col("o_orderdate")) - 1
        ).alias("month_id"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("month_id").alias("cohort"))
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    aged = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort", (F.col("month_id") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = aged.select(
        "cohort",
        "age",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )
    return cum.join(sized, "cohort").select(
        "cohort",
        "age",
        "cohort_size",
        "cum_cents",
        (
            F.col("cum_cents").cast("double") / F.col("cohort_size")
        ).alias("ltv_cents_per_customer"),
    )


# --------------------------------------------------------------------------
# Position-weighted (U-shape) attribution — the multi-touch sibling.
# --------------------------------------------------------------------------
_ATTR_FXP = 1048576.0  # 2^20 credit grid


@query(
    "attribution_position_weighted",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), p AS (
        SELECT user_id, event_id AS pid, ts_us AS pts FROM e
        WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_id AS tid, event_type AS touch_type,
               ts_us AS tts
        FROM e WHERE event_type IN ('click', 'view')
    ), pairs AS (
        SELECT p.pid, t.touch_type, t.tts, t.tid,
               count(*) OVER (PARTITION BY p.pid) AS k,
               row_number() OVER (
                   PARTITION BY p.pid ORDER BY t.tts, t.tid) AS ra,
               row_number() OVER (
                   PARTITION BY p.pid ORDER BY t.tts DESC, t.tid DESC) AS rd
        FROM p JOIN t ON t.user_id = p.user_id
         AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
         AND p.pts - t.tts <= {ATTR_LOOKBACK_US}
    ), credited AS (
        SELECT touch_type,
               CAST(round((CASE WHEN k = 1 THEN 1.0
                                WHEN k = 2 THEN 0.5
                                WHEN ra = 1 OR rd = 1 THEN 0.4
                                ELSE 0.2 / (k - 2.0)
                           END) * {_ATTR_FXP}) AS BIGINT) AS q
        FROM pairs
    ), touched AS (
        SELECT touch_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / {_ATTR_FXP}
                   AS credit
        FROM credited GROUP BY touch_type
    )
    SELECT * FROM touched
    UNION ALL
    SELECT 'none' AS touch_type,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(count(*) AS DOUBLE) AS credit
    FROM p WHERE NOT EXISTS (
        SELECT 1 FROM t
        WHERE t.user_id = p.user_id
          AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
          AND p.pts - t.tts <= {ATTR_LOOKBACK_US})
    """,
)
def attribution_position_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every purchase
    splits one unit of credit across ALL qualifying touches in the
    7-day lookback — 40% to the first touch, 40% to the last, 20%
    shared across the middle (1.0 / 0.5-0.5 for one/two-touch paths) —
    the standard answer to last-touch's (attribution_last_touch)
    known bias toward bottom-of-funnel channels; running both and
    diffing per-channel credit IS the attribution-model sensitivity
    analysis.

    Determinism: per-pair weights are pinned rational expressions;
    each credit quantizes to the 2^-20 grid and channel totals are
    plain INTEGER sums (order-free, partial-aggregatable — the _fxp
    discipline applied to money-like credit), reported after one final
    division. Untouched purchases carry whole-unit credit to 'none', so
    Σ credit = #purchases exactly (the conservation property test).

    Plan: one user-keyed equi-join pairs purchases with their touches
    (per-user activity bounds the blowup; the lookback predicate is a
    residual filter), two shared-partition windows rank within each
    purchase, then a channel-key rollup. The anti-join supplies the
    'none' row. No inequality-join fallback to nested loops."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts_us").alias("pts")
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("touch_type"),
        F.col("ts_us").alias("tts"),
    )
    qual = (F.col("tts") < F.col("pts")) | (
        (F.col("tts") == F.col("pts")) & (F.col("tid") < F.col("pid"))
    )
    within = (F.col("pts") - F.col("tts")) <= ATTR_LOOKBACK_US
    pairs = p.join(t, "user_id").filter(qual & within)
    wk = Window.partitionBy("pid")
    wa = Window.partitionBy("pid").orderBy("tts", "tid")
    wd = Window.partitionBy("pid").orderBy(F.desc("tts"), F.desc("tid"))
    ranked = pairs.select(
        "pid",
        "touch_type",
        F.count(F.lit(1)).over(wk).alias("k"),
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("ra") == 1) | (F.col("rd") == 1), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - F.lit(2.0)))
    )
    credited = ranked.select(
        "touch_type",
        F.round(weight * F.lit(_ATTR_FXP)).cast("long").alias("q"),
    )
    touched = credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        (F.sum("q").cast("long").cast("double") / F.lit(_ATTR_FXP)).alias(
            "credit"
        ),
    )
    none_row = (
        p.join(
            t,
            (p.user_id == t.user_id) & qual & within,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_credits"))
        .select(
            F.lit("none").alias("touch_type"),
            "n_credits",
            F.col("n_credits").cast("double").alias("credit"),
        )
    )
    return touched.unionByName(none_row)


# --------------------------------------------------------------------------
# Shapley-value attribution — the game-theoretic member of the family.
# --------------------------------------------------------------------------
_SHAP_GRID = 12  # lcm(1..4): |path set| <= 4 channels, so 12/k is exact


@query(
    "attribution_shapley",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        FROM events
    ), p AS (
        SELECT user_id, event_id AS pid, ts_us AS pts FROM e
        WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_id AS tid, event_type AS touch_type,
               ts_us AS tts
        FROM e WHERE event_type <> 'purchase'
    ), member AS (
        SELECT DISTINCT p.pid, t.touch_type
        FROM p JOIN t ON t.user_id = p.user_id
         AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
         AND p.pts - t.tts <= {ATTR_LOOKBACK_US}
    ), sized AS (
        SELECT pid, touch_type,
               count(*) OVER (PARTITION BY pid) AS k
        FROM member
    ), credited AS (
        SELECT touch_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               CAST(CAST(sum({_SHAP_GRID} // k) AS BIGINT) AS DOUBLE)
                   / {_SHAP_GRID}.0 AS credit
        FROM sized GROUP BY touch_type
    )
    SELECT * FROM credited
    UNION ALL
    SELECT 'none' AS touch_type,
           CAST(count(*) AS BIGINT) AS n_credits,
           CAST(count(*) AS DOUBLE) AS credit
    FROM p WHERE NOT EXISTS (
        SELECT 1 FROM t
        WHERE t.user_id = p.user_id
          AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
          AND p.pts - t.tts <= {ATTR_LOOKBACK_US})
    """,
)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value attribution over the channel coalition game: with
    v(S) = number of purchases whose touched-channel set is a non-empty
    subset of S (the standard simplified-Shapley value function for
    multi-touch attribution), v decomposes exactly into unanimity games
    v = Σ_T c_T·u_T, and by linearity the Shapley value collapses to the
    CLOSED FORM φ_i = Σ_{{T ∋ i}} c_T / |T| — each purchase splits one
    unit of credit EQUALLY across the distinct channels in its 7-day
    lookback path. No 2^n coalition enumeration is ever needed: the
    theorem is the query plan. Completes the attribution family
    (last-touch / position-weighted / markov-removal / shapley); diffing
    the four credit columns is the model-sensitivity analysis.

    Exactness: |path set| <= 4 channel types, so per-member credit 1/k
    lands exactly on the 1/12 grid (12 = lcm(1..4)); channel totals are
    plain integer sums divided ONCE. Untouched purchases credit 'none'
    whole units, so Σ credit = #purchases exactly (conservation,
    property-tested).

    Plan: one user-keyed equi-join pairs purchases with touches (same
    shape as attribution_position_weighted), a DISTINCT to channel-set
    membership grain, one pid-partition window for |set|, then a
    channel rollup + anti-join 'none' row. All partial-aggregatable
    after the distinct; no inequality-join nested loops."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts_us").alias("pts")
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("touch_type"),
        F.col("ts_us").alias("tts"),
    )
    qual = (F.col("tts") < F.col("pts")) | (
        (F.col("tts") == F.col("pts")) & (F.col("tid") < F.col("pid"))
    )
    within = (F.col("pts") - F.col("tts")) <= ATTR_LOOKBACK_US
    member = (
        p.join(t, "user_id")
        .filter(qual & within)
        .select("pid", "touch_type")
        .distinct()
    )
    wk = Window.partitionBy("pid")
    sized = member.select(
        "touch_type", F.count(F.lit(1)).over(wk).alias("k")
    )
    credited = sized.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        (
            F.sum(F.expr(f"{_SHAP_GRID} DIV k")).cast("long").cast("double")
            / F.lit(float(_SHAP_GRID))
        ).alias("credit"),
    )
    none_row = (
        p.join(t, (p.user_id == t.user_id) & qual & within, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_credits"))
        .select(
            F.lit("none").alias("touch_type"),
            "n_credits",
            F.col("n_credits").cast("double").alias("credit"),
        )
    )
    return credited.unionByName(none_row)


# --------------------------------------------------------------------------
# Stream-stream join state sizing: peak retained rows under an interval
# join horizon — the number that sizes the join's state store.
# --------------------------------------------------------------------------
_JSP_HORIZON_NS = 10 * 60 * 1_000_000_000  # 10-minute join horizon


@query(
    "stream_join_state_peak",
    oracle=f"""
    WITH b AS (
        SELECT event_type, epoch_ns(ts) AS t, CAST(1 AS BIGINT) AS delta
        FROM events
        UNION ALL
        SELECT event_type, epoch_ns(ts) + {_JSP_HORIZON_NS} AS t,
               CAST(-1 AS BIGINT) AS delta
        FROM events
    ), sweep AS (
        SELECT event_type,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS live
        FROM b
    )
    SELECT event_type,
           CAST(count(*) / 2 AS BIGINT) AS n_events,
           CAST({_JSP_HORIZON_NS // 60_000_000_000} AS BIGINT)
               AS horizon_minutes,
           CAST(max(live) AS BIGINT) AS peak_state_rows
    FROM sweep GROUP BY event_type
    """,
)
def stream_join_state_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak state-store occupancy of a stream-stream interval join: under
    a ±10-minute horizon (the shape of streaming/windows.py's
    stream-stream interval join), each side retains every row whose
    event time is within the horizon of the watermark — the PEAK of that
    retention, per stream, is the number that sizes the join's state
    store and decides the RocksDB-vs-heap provider question BEFORE the
    job is deployed. Computed as the classic sweep line: +1 at ts, −1 at
    ts + horizon, running sum, max — the batch twin of the state-store
    metric, and the join-side companion of stream_state_keys_profile
    (which sizes AGGREGATION state by key count).

    Determinism: boundaries, the running sum, and the peak are exact
    integers; ties at identical boundary instants are pinned by
    (t, delta) ordering — a row expiring exactly when another arrives
    releases its slot first (the [ts, ts+H) retention convention),
    identical on both engines.

    Plan: one union of two scan projections, a per-stream ordered
    running sum, a stream-keyed max rollup. The per-type sweep window is
    fact-scale — at 100 TB it becomes the two-phase form (per-time-bucket
    local sweeps + broadcast cross-bucket offsets, exactly
    global_rank_two_phase's registered pattern); the answer is identical
    because prefix sums compose."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    b = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.lit(_JSP_HORIZON_NS)).alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = b.select("event_type", F.sum("delta").over(w).alias("live"))
    return sweep.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_events"),
        F.lit(_JSP_HORIZON_NS // 60_000_000_000)
        .cast("long")
        .alias("horizon_minutes"),
        F.max("live").cast("long").alias("peak_state_rows"),
    )


# --------------------------------------------------------------------------
# Dynamic-gap sessionization: Spark's native session_window with a PER-ROW
# gap — purchases hold a session open longer than clicks.
# --------------------------------------------------------------------------
_DG_GAPS_US = {"purchase": 30 * 60_000_000, "signup": 20 * 60_000_000}
_DG_DEFAULT_US = 10 * 60_000_000


def _dg_gap_sql(col: str) -> str:
    whens = "".join(
        f" WHEN {col} = '{k}' THEN {v}" for k, v in sorted(_DG_GAPS_US.items())
    )
    return f"(CASE{whens} ELSE {_DG_DEFAULT_US} END)"


@query(
    "dynamic_gap_sessions",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t,
               {_dg_gap_sql('event_type')} AS g
        FROM events
    ), o AS (
        SELECT user_id, t, g,
               max(t + g) OVER (PARTITION BY user_id ORDER BY t, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_end
        FROM e
    ), brk AS (
        SELECT user_id, t, g,
               CASE WHEN prev_end IS NULL OR t > prev_end
                    THEN 1 ELSE 0 END AS b
        FROM o
    ), isl AS (
        SELECT user_id, t, g,
               sum(b) OVER (PARTITION BY user_id ORDER BY t, g
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS sid
        FROM brk
    ), per_session AS (
        SELECT user_id, sid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(t + g) - min(t) AS BIGINT) AS span_us
        FROM isl GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_session_events,
           CAST(sum(span_us) AS BIGINT) AS total_span_us
    FROM per_session GROUP BY user_id
    """,
)
def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a DYNAMIC, per-event inactivity gap through
    Spark's native session_window: a purchase holds its session open for
    30 minutes, a signup 20, everything else 10 — the realistic rule
    (high-intent events extend engagement) that the fixed-gap
    sessionize_events cannot express, and the exact batch form of the
    streaming dynamic-gap session operator. Windows [t, t+gap) merge
    when the next start is <= the running end (verified empirically:
    adjacency merges), so the oracle reproduces the merge as
    gaps-and-islands over max(t+gap) running ends.

    Determinism: all boundaries are exact integer microseconds; the
    island scan orders by (t, event_id); per-user outputs are integer
    counts and one exact span sum — nothing floating anywhere.

    Plan: ONE user_id shuffle into session_window's merge (Spark sorts
    within partition), then a user-keyed rollup on the same exchange.
    State per user is one open session — the streaming form carries the
    same invariant."""
    ev = load_table(spark, sf_dir, "events")
    whens = "".join(
        f" WHEN event_type = '{k}' THEN '{v // 1_000_000} seconds'"
        for k, v in sorted(_DG_GAPS_US.items())
    )
    gap = F.expr(
        f"CASE{whens} ELSE '{_DG_DEFAULT_US // 1_000_000} seconds' END"
    )
    d = ev.select(
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("t"),
        gap.alias("gap"),
    )
    per_session = d.groupBy(
        "user_id", F.session_window("t", F.col("gap")).alias("sw")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    spans = per_session.select(
        "user_id",
        "n",
        (
            F.unix_micros(F.col("sw.end")) - F.unix_micros(F.col("sw.start"))
        ).alias("span_us"),
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n").cast("long").alias("n_events"),
        F.max("n").cast("long").alias("max_session_events"),
        F.sum("span_us").cast("long").alias("total_span_us"),
    )
