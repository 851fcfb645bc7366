"""Time-series analytics over the events stream: OHLC bars, time-weighted
averages, and z-score outlier detection — the TSDB-style rollups a
metrics/trading workload expects (engine-surface extensions beyond the
reference pipeline, same category as plans/analytics_ext.py gap-fill).

Determinism rules (cross-engine hash parity):

* OHLC open/close SELECT a value (no float accumulation) — ties broken by
  the unique event_id, so the picked row is unique.
* time-weighted average sums ``cents × Δt_us`` in DECIMAL — exact — and
  only the final ratio is a double (IEEE division of identical operands is
  identical on both engines).
* z-score moments come from exact DECIMAL sums of integer cents; the
  per-row predicate is the *same* double expression text on both engines
  over bit-identical inputs, so the comparison can't flip.

Scale notes (100 TB):
* ohlc_bars: one hash-agg shuffle on (bucket, event_type) with map-side
  partials (min/max/count/sum all partial-aggregatable).
* time_weighted_avg: one shuffle on user_id (high cardinality → even
  spread); lead() is a single window pass within the same partitioning.
* anomaly_zscore: per-group moments are a 3-row aggregate, broadcast back
  for the row-level predicate — lineitem is scanned twice but never
  shuffled on a fact-sized key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import floor_bucket_s
from ..registry import query
from ..sources.parquet import load_table


# --------------------------------------------------------------------------
# OHLC bars: open/high/low/close per hour per event_type.
# --------------------------------------------------------------------------
@query(
    "ohlc_bars",
    oracle="""
    SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS bar_start_s,
           event_type,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           count(*) AS n_ticks,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour OHLC bars. Open/close pick the min/max (ts, event_id, value)
    struct — lexicographic struct ordering with a unique tie-breaker, the
    deterministic twin of DuckDB's ``first(... ORDER BY ts, event_id)``.
    Volume sums exact integer cents. One partial-aggregatable shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bar_start_s", floor_bucket_s("ts", 3600))
        .groupBy("bar_start_s", "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value"))["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")) / 100.0, 2
            ).alias("volume"),
        )
    )


# --------------------------------------------------------------------------
# Time-weighted average: each observation weighted by its holding interval.
# --------------------------------------------------------------------------
@query(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS ts_us,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_us
        FROM events
    )
    SELECT user_id,
           count(*) AS n_intervals,
           -- nullif guard: if a user's events all collapse to one microsecond
           -- the denominator is 0; Spark's non-ANSI division yields NULL while
           -- DuckDB's IEEE double division yields NaN — nullif pins both to NULL.
           CAST(sum(CAST(cents AS DECIMAL(38,0)) * (next_us - ts_us))
                AS DOUBLE)
               / (CAST(nullif(sum(next_us - ts_us), 0) AS DOUBLE) * 100.0)
               AS time_weighted_value
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-weighted mean of ``value`` per user (the TSDB
    ``time_weight`` rollup): each observation holds until the next event;
    the last observation has no interval and is excluded. Numerator is an
    exact DECIMAL sum of cents x microseconds; only the final ratio is
    floating point."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr("(ts - pmod(ts, 1000)) div 1000").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.withColumn("next_us", F.lead("ts_us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        # nullif mirrors the oracle: zero total interval → NULL on both engines
        # (Spark non-ANSI division would NULL anyway; DuckDB would NaN without it).
        F.expr(
            "CAST(sum(CAST(cents AS DECIMAL(38,0)) * (next_us - ts_us)) AS DOUBLE)"
            " / (CAST(nullif(sum(next_us - ts_us), 0) AS DOUBLE) * 100.0)"
        ).alias("time_weighted_value"),
    )


# --------------------------------------------------------------------------
# Z-score outliers from exact integer moments.
# --------------------------------------------------------------------------
@query(
    "anomaly_zscore",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_extendedprice,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    ), m AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS s,
               CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE)
                   / 10000.0 AS ss
        FROM c GROUP BY l_returnflag
    ), z AS (
        SELECT c.l_returnflag, c.l_extendedprice, m.n,
               s / n AS mu,
               sqrt(ss / n - (s / n) * (s / n)) AS sigma
        FROM c JOIN m USING (l_returnflag)
    )
    SELECT l_returnflag,
           max(n) AS n_rows,
           max(mu) AS mean_price,
           max(sigma) AS std_price,
           -- CAST AS BIGINT: DuckDB sum(int) is HUGEINT → pandas float64,
           -- Spark bigint; the driver hash diverges on type, not value.
           CAST(sum(CASE WHEN sigma = 0.0 THEN 0
                    WHEN abs((l_extendedprice - mu) / sigma) > 2.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM z
    GROUP BY l_returnflag
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag price outliers at |z| > 2. Moments are derived from exact
    DECIMAL sums of integer cents, then cast to double ONCE — after that
    both engines evaluate the identical IEEE expression over bit-identical
    operands, so the boundary comparison is reproducible. The 3-row moment
    table is broadcast back onto the scan (no fact-sized shuffle)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    moments = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0").alias(
            "s"
        ),
        F.expr(
            "CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) / 10000.0"
        ).alias("ss"),
    )
    z = (
        li.join(F.broadcast(moments), "l_returnflag")
        .withColumn("mu", F.expr("s / n"))
        .withColumn("sigma", F.expr("sqrt(ss / n - (s / n) * (s / n))"))
    )
    return z.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        F.max("mu").alias("mean_price"),
        F.max("sigma").alias("std_price"),
        F.sum(
            F.expr(
                "CASE WHEN sigma = 0.0 THEN 0"
                " WHEN abs((l_extendedprice - mu) / sigma) > 2.0"
                " THEN 1 ELSE 0 END"
            )
        ).alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# Grouped custom aggregation via applyInPandas: exact-integer OLS slope.
# --------------------------------------------------------------------------
def _linear_fit_group(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
    """Per-group OLS slope of value (cents) over time (hours since the
    group's first event). All sums run in PYTHON INTEGERS (arbitrary
    precision — exact), so the closed-form slope is one IEEE division at
    the end: bit-identical to the oracle's DECIMAL-sum formula."""
    import pandas as pd

    xs = [int(v) for v in pdf["ts_h"]]
    ys = [int(v) for v in pdf["cents"]]
    n = len(xs)
    # moments accumulate in exact Python ints, then convert to double ONCE
    # — the same boundary the oracle's CAST(sum(...) AS DOUBLE) sits at —
    # and the closed form below is evaluated in doubles in the SAME order
    # as the oracle text (int-exact evaluation would diverge past 2^53)
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    den = n * sxx - sx * sx
    slope = None if den == 0.0 else (n * sxy - sx * sy) / (den * 100.0)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [n],
            "slope_per_hour": [slope],
        }
    )


@query(
    "grouped_linear_fit",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) // 3600000000 AS ts_h0
        FROM events
    ), rel AS (
        SELECT event_type, cents,
               ts_h0 - min(ts_h0) OVER (PARTITION BY event_type) AS ts_h
        FROM base
    ), m AS (
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(ts_h AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(ts_h AS DECIMAL(38,0)) * ts_h) AS DOUBLE) AS sxx,
               CAST(sum(CAST(ts_h AS DECIMAL(38,0)) * cents) AS DOUBLE) AS sxy
        FROM rel GROUP BY event_type
    )
    SELECT event_type, n AS n_events,
           CASE WHEN (n * sxx - sx * sx) = 0.0 THEN NULL
                ELSE (n * sxy - sx * sy) / ((n * sxx - sx * sx) * 100.0)
           END AS slope_per_hour
    FROM m
    """,
)
def grouped_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value trend (cents/hour) — the grouped-custom-model
    shape (applyInPandas): Spark shuffles each group to one Arrow batch and
    the worker runs arbitrary Python over it. The hot math here stays
    exact-integer so the result is verifiable; a real job would fit sklearn
    models in the same harness. Groups are bounded (5 types) — for
    high-cardinality keys this shape holds per-key state only, and skewed
    giant groups would need the moment-based formulation instead (which
    corr_exact demonstrates as pure SQL)."""
    import pyspark.sql.types as T

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.expr("(ts - pmod(ts, 3600000000000)) div 3600000000000").alias(
            "ts_h0"
        ),
    )
    rel = ev.withColumn(
        "ts_h",
        F.col("ts_h0") - F.min("ts_h0").over(Window.partitionBy("event_type")),
    ).select("event_type", "cents", "ts_h")
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("slope_per_hour", T.DoubleType()),
        ]
    )
    return rel.groupBy("event_type").applyInPandas(_linear_fit_group, schema)


# --------------------------------------------------------------------------
# Robust outliers via median absolute deviation (the z-score's heavy-tail-
# safe sibling: median/MAD are unmoved by the very outliers being hunted).
# --------------------------------------------------------------------------
@query(
    "mad_robust_outliers",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
        FROM c GROUP BY event_type
    ), dev AS (
        SELECT c.event_type, c.cents, m.med_cents,
               abs(c.cents - m.med_cents) AS adev
        FROM c JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n_rows,
           round(max(d.med_cents) / 100.0, 6) AS median_value,
           round(max(m.mad_cents) / 100.0, 6) AS mad_value,
           CAST(sum(CASE WHEN m.mad_cents = 0 THEN 0
                         WHEN d.adev > 3 * m.mad_cents THEN 1
                         ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers at |x - median| > 3·MAD. Unlike the z-score
    (anomaly_zscore), median and MAD don't move when the tail is heavy —
    the estimator the outliers themselves cannot corrupt.

    Determinism: values quantize to integer cents, so the interpolated
    medians land on exact multiples of 0.5 cents, absolute deviations on
    multiples of 0.5, and the 3·MAD boundary on multiples of 0.5 — every
    comparison is between exactly-representable doubles, identical on both
    engines. Plan: two bounded-group percentile aggregations (exact
    percentile holds one group's values; groups here are the handful of
    event types) and the tiny median/MAD tables broadcast back onto the
    scan — no fact-sized shuffle beyond the two aggs; unbounded-group
    variants switch to approx_percentile exactly as percentile_agg
    documents."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max("med_cents") / 100.0, 6).alias("median_value"),
            F.round(F.max("mad_cents") / 100.0, 6).alias("mad_value"),
            F.sum(
                F.when(F.col("mad_cents") == 0, 0)
                .when(F.col("adev") > 3 * F.col("mad_cents"), 1)
                .otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# Scale-mode twin: median + MAD on the mergeable-sketch path.
_MAD_EPS = 0.04


@query(
    "mad_robust_outliers_approx",
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT event_type,
               approx_quantile(cents, 0.5) AS med_cents,
               quantile_cont(cents, [{0.5 - _MAD_EPS}, {0.5 + _MAD_EPS}])
                   AS med_bd
        FROM c GROUP BY event_type
    ), dev AS (
        SELECT c.event_type, abs(c.cents - m.med_cents) AS adev,
               CAST(m.med_cents BETWEEN m.med_bd[1] AND m.med_bd[2] AS INT)
                   AS med_ok
        FROM c JOIN med m USING (event_type)
    ), rolled AS (
        SELECT event_type,
               count(*) AS n_rows,
               max(med_ok) AS med_ok,
               approx_quantile(adev, 0.5) AS mad_a,
               quantile_cont(adev, [{0.5 - _MAD_EPS}, {0.5 + _MAD_EPS}])
                   AS mad_bd
        FROM dev GROUP BY event_type
    )
    SELECT event_type, n_rows, med_ok,
           CAST(mad_a BETWEEN mad_bd[1] AND mad_bd[2] AS INT) AS mad_ok
    FROM rolled
    """,
)
def mad_robust_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-mode twin of mad_robust_outliers: median and MAD both come
    from approx_percentile — O(accuracy) mergeable state per event type
    instead of buffering the column twice, i.e. the robust-statistics
    plan run at unbounded group sizes. Each engine's absolute deviations
    are taken against its OWN sketch median, so values are
    engine-specific; the contract is bounded rank error on both
    statistics — sketch median inside the exact (50±4)% band of cents,
    sketch MAD inside the exact (50±4)% band of that engine's own adev
    column — plus exact, engine-invariant group row counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    band = F.array(F.lit(0.5 - _MAD_EPS), F.lit(0.5 + _MAD_EPS))
    med = ev.groupBy("event_type").agg(
        F.percentile_approx("cents", F.lit(0.5), 10000).alias("med_cents"),
        # one array aggregate carries both band edges (one value buffer)
        F.percentile("cents", band).alias("med_bd"),
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
        F.col("med_cents")
        .between(F.element_at("med_bd", 1), F.element_at("med_bd", 2))
        .cast("int")
        .alias("med_ok"),
    )
    return dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("med_ok").alias("med_ok"),
        F.percentile_approx("adev", F.lit(0.5), 10000)
        .between(
            F.element_at(F.percentile("adev", band), 1),
            F.element_at(F.percentile("adev", band), 2),
        )
        .cast("int")
        .alias("mad_ok"),
    )


# --------------------------------------------------------------------------
# Calendar activity profile: day-of-week x hour event heatmap, from pure
# integer epoch math (no timezone/locale function can split the engines:
# 1970-01-01 was a Thursday, so dow = (epoch_day + 4) % 7 with Sunday=0).
# --------------------------------------------------------------------------
_HOUR_US = 3_600_000_000
_DAY_US_CAL = 86_400_000_000


@query(
    "events_dow_hour_profile",
    oracle=f"""
    WITH e AS (
        SELECT user_id,
               (epoch_us(ts) // {_DAY_US_CAL} + 4) % 7 AS dow,
               (epoch_us(ts) // {_HOUR_US}) % 24 AS hour
        FROM events
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(hour AS BIGINT) AS hour,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e GROUP BY dow, hour
    """,
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (events and distinct users per
    cell) — the load-shape profile behind capacity planning and bot
    detection. Weekday derives from integer epoch arithmetic rather than
    dayofweek()/strftime, whose week-start and locale conventions differ
    between engines.

    Plan shape: the projection stays in the scan stage; ONE aggregation
    onto at most 168 (dow, hour) cells — the distinct-user count expands
    rows map-side but partials collapse per cell. Scan-bound at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    # ts is int64 nanos; all math stays in integer division/modulo
    e = ev.select(
        "user_id",
        F.expr(f"(((ts div 1000) div {_DAY_US_CAL}) + 4) % 7").alias("dow"),
        F.expr(f"((ts div 1000) div {_HOUR_US}) % 24").alias("hour"),
    )
    return e.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# --------------------------------------------------------------------------
# Rolling median smoothing: exact 5-row centered median per user — the
# robust alternative to the moving average (window_moving_avg), immune
# to single-spike outliers.
# --------------------------------------------------------------------------
@query(
    "rolling_median_smooth",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS ts_us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id, event_id,
           quantile_cont(cents, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) / 100.0 AS smoothed_value
    FROM e
    """,
)
def rolling_median_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 5-row rolling median of event value per user (exact, via
    the percentile aggregate as a window function). Values quantize to
    integer cents, so the interpolated median of an even-sized edge
    frame lands on exact half-cent multiples and the final /100
    division is exact on both engines — the mad_robust_outliers
    discipline in a sliding frame.

    Plan shape: ONE user_id exchange + sort; each frame holds ≤5 values,
    so the per-row percentile state is constant-size — unlike a rank
    window, the frame never grows with history. Scan-bound after the
    single shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-2, 2)
    )
    return e.select(
        "user_id",
        "event_id",
        (F.percentile("cents", F.lit(0.5)).over(w) / 100.0).alias(
            "smoothed_value"
        ),
    )


# --------------------------------------------------------------------------
# Inter-purchase gap survival curve: share of purchase gaps that survive
# past each day boundary — the repeat-purchase analytic behind churn
# windows and re-engagement timing.
# --------------------------------------------------------------------------
@query(
    "purchase_gap_survival",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'purchase'
    ), gaps AS (
        SELECT (lead(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id
                ) - ts_us) // {_DAY_US_CAL} AS gap_days
        FROM p
    ), hist AS (
        SELECT gap_days, count(*) AS n_gaps
        FROM gaps WHERE gap_days IS NOT NULL
        GROUP BY gap_days
    ), tot AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS n_total FROM hist)
    SELECT CAST(h.gap_days AS BIGINT) AS gap_days,
           CAST(h.n_gaps AS BIGINT) AS n_gaps,
           CAST(t.n_total
                - sum(h.n_gaps) OVER (ORDER BY h.gap_days
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_surviving,
           CAST(t.n_total
                - sum(h.n_gaps) OVER (ORDER BY h.gap_days
                                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / t.n_total AS survival
    FROM hist h CROSS JOIN tot t
    """,
)
def purchase_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of inter-purchase gaps: per whole-day bucket, how
    many gaps and what share of ALL gaps are strictly longer (the
    complementary cumulative distribution). The curve's knee is where
    churn windows and re-engagement nudges get set.

    Plan shape: one user_id window pass builds gaps; the day histogram
    collapses to O(#distinct gap-days) rows BEFORE the running-sum
    window, which therefore orders a bounded single partition (the
    concurrent_intervals discipline); one IEEE division of exact
    integers per row."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        p.select(
            (F.lead("ts_us").over(w) - F.col("ts_us")).alias("gap_us")
        )
        .filter(F.col("gap_us").isNotNull())
        .select(F.expr(f"gap_us div {_DAY_US_CAL}").alias("gap_days"))
    )
    hist = gaps.groupBy("gap_days").agg(F.count(F.lit(1)).alias("n_gaps"))
    tot = hist.agg(F.sum("n_gaps").cast("long").alias("n_total"))
    wrun = Window.orderBy("gap_days").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("gap_days").cast("long").alias("gap_days"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            (F.col("n_total") - F.sum("n_gaps").over(wrun))
            .cast("long")
            .alias("n_surviving"),
            (
                (F.col("n_total") - F.sum("n_gaps").over(wrun)).cast("double")
                / F.col("n_total")
            ).alias("survival"),
        )
    )


# --------------------------------------------------------------------------
# Additive seasonal decomposition (STL-lite): trend = centered 12-month
# mean, seasonal = month-of-year mean of detrended, residual = the rest —
# all-integer until the final scaled divisions.
# --------------------------------------------------------------------------
@query(
    "seasonal_decompose_monthly",
    oracle="""
    WITH m AS (
        SELECT (year(CAST(o_orderdate AS DATE)) * 12
                + month(CAST(o_orderdate AS DATE)) - 1) AS month_id,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), tr AS (
        SELECT month_id, cents,
               CAST(sum(cents) OVER w AS BIGINT) AS trend12,
               count(*) OVER w AS n_win
        FROM m
        WINDOW w AS (ORDER BY month_id
                     ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    ), full_w AS (
        SELECT month_id, cents,
               12 * cents - trend12 AS det12,
               month_id % 12 AS moy,
               trend12
        FROM tr WHERE n_win = 12
    ), seas AS (
        SELECT moy,
               CAST(sum(det12) AS BIGINT) AS det12_sum,
               count(*) AS n_years
        FROM full_w GROUP BY moy
    )
    SELECT f.month_id,
           round(f.cents / 100.0, 2) AS revenue,
           round(f.trend12 / 1200.0, 6) AS trend,
           round(CAST(s.det12_sum AS DOUBLE) / (1200.0 * s.n_years), 6)
               AS seasonal,
           round(f.det12 / 1200.0
                 - CAST(s.det12_sum AS DOUBLE) / (1200.0 * s.n_years), 6)
               AS residual
    FROM full_w f JOIN seas s ON s.moy = f.moy
    """,
)
def seasonal_decompose_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of monthly order revenue
    (STL-lite): trend is the centered 12-month mean (only months with a
    FULL window emit — no edge extrapolation), seasonality is the
    month-of-year mean of the detrended series, residual is what's left.

    Exactness discipline: monthly revenue quantizes to integer cents, the
    trend window sum stays integer, and the detrended series is carried
    as 12*cents - trend_sum (still integer — multiplying through by 12
    defers EVERY division), so the seasonal means are integer sums until
    one final scaled division per output column; both engines round the
    same doubles. Plan shape: one month rollup (84 rows at any corpus
    size — months, not orders, bound the state), a single-partition
    84-row window, a 12-key seasonal agg, one tiny join. The ONLY
    fact-scale work is the first aggregation; everything after is
    calendar-sized, so the single-partition window is O(months) — the
    concurrent_intervals single-reducer discipline."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.select(
            (
                F.year(F.col("o_orderdate").cast("date")) * 12
                + F.month(F.col("o_orderdate").cast("date"))
                - 1
            ).alias("month_id"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("month_id")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.orderBy("month_id").rowsBetween(-5, 6)
    tr = m.select(
        "month_id",
        "cents",
        F.sum("cents").over(w).cast("long").alias("trend12"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    full_w = tr.filter(F.col("n_win") == 12).select(
        "month_id",
        "cents",
        (12 * F.col("cents") - F.col("trend12")).alias("det12"),
        (F.col("month_id") % 12).alias("moy"),
        "trend12",
    )
    seas = full_w.groupBy("moy").agg(
        F.sum("det12").cast("long").alias("det12_sum"),
        F.count(F.lit(1)).alias("n_years"),
    )
    seasonal = F.col("det12_sum").cast("double") / (1200.0 * F.col("n_years"))
    return full_w.join(F.broadcast(seas), "moy").select(
        "month_id",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("trend12") / 1200.0, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col("det12") / 1200.0 - seasonal, 6).alias("residual"),
    )


# --------------------------------------------------------------------------
# Autocorrelation function: ACF at lags 1..6 of the monthly revenue series.
# --------------------------------------------------------------------------
_ACF_LAGS = 6


def _acf_oracle() -> str:
    lag_cols = ",\n               ".join(
        f"lag(d, {k}) OVER w AS dlag{k}" for k in range(1, _ACF_LAGS + 1)
    )
    num_cols = ",\n               ".join(
        f"sum(d * dlag{k}) AS num{k}" for k in range(1, _ACF_LAGS + 1)
    )
    num_case = " ".join(
        f"WHEN {k} THEN num{k}" for k in range(1, _ACF_LAGS + 1)
    )
    return f"""
    WITH m AS (
        SELECT l_returnflag,
               (year(CAST(l_shipdate AS DATE)) * 12
                + month(CAST(l_shipdate AS DATE)) - 1) AS month_id,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ), st AS (
        SELECT l_returnflag,
               count(*) AS n_months,
               CAST(sum(c) AS HUGEINT) AS s_total
        FROM m GROUP BY 1
    ), d AS (
        SELECT m.l_returnflag, m.month_id, st.n_months,
               CAST(st.n_months AS HUGEINT) * m.c - st.s_total AS d
        FROM m JOIN st USING (l_returnflag)
    ), l AS (
        SELECT l_returnflag, n_months, d,
               {lag_cols}
        FROM d
        WINDOW w AS (PARTITION BY l_returnflag ORDER BY month_id)
    ), g AS (
        SELECT l_returnflag,
               max(n_months) AS n_months,
               sum(d * d) AS den,
               {num_cols}
        FROM l GROUP BY l_returnflag
    )
    SELECT g.l_returnflag,
           CAST(g.n_months AS BIGINT) AS n_months,
           CAST(k.lag_k AS BIGINT) AS lag_k,
           -- HUGEINT -> VARCHAR -> DOUBLE: DuckDB's direct HUGEINT->DOUBLE
           -- cast is not correctly rounded (measured 1-ulp error); its
           -- string->double parse IS, and matches Spark's DECIMAL->DOUBLE.
           CAST(CAST((CASE k.lag_k {num_case} END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(g.den AS VARCHAR) AS DOUBLE) AS acf
    FROM g
    CROSS JOIN (SELECT unnest(generate_series(1, {_ACF_LAGS})) AS lag_k) k
    """


@query("autocorr_lags", oracle=_acf_oracle())
def autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the monthly revenue series at lags 1..6,
    one series per l_returnflag: r_k = sum_t d_t*d_{t+k} / sum_t d_t^2
    with d_t the mean-centered monthly total. The ACF is the
    stationarity/seasonality diagnostic a forecasting pipeline runs before
    choosing a model order.

    Exactness discipline: centering by the mean would make every term an
    IEEE sum of data-dependent doubles, so instead each deviation is
    SCALED BY n — d_t = n*c_t - S with c_t integer month cents and
    S = sum(c) — which is exactly n*(c_t - mean), an integer. ACF ratios
    are invariant to that scaling. Products reach ~1e22 at sf0.1, so the
    accumulator is DECIMAL(38,0) on the Spark side and HUGEINT in the
    oracle; the single final division is the only float op (identical
    exact integers -> identical doubles -> identical IEEE quotient).

    Scale posture: the ONLY fact-scale work is the month rollup (one
    partial-aggregatable shuffle); the series itself is calendar-bounded
    (~84 rows per flag), so the per-flag lag window and the lag products
    run on a KB-sized relation no matter the corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            "l_returnflag",
            (
                F.year(F.col("l_shipdate").cast("date")) * 12
                + F.month(F.col("l_shipdate").cast("date"))
                - 1
            ).alias("month_id"),
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("l_returnflag", "month_id")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    st = m.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("c").cast("decimal(38,0)").alias("s_total"),
    )
    d = m.join(F.broadcast(st), "l_returnflag").select(
        "l_returnflag",
        "month_id",
        "n_months",
        (
            F.col("n_months").cast("decimal(38,0)") * F.col("c")
            - F.col("s_total")
        ).alias("d"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("month_id")
    for k in range(1, _ACF_LAGS + 1):
        d = d.withColumn(f"dlag{k}", F.lag("d", k).over(w))
    g = d.groupBy("l_returnflag").agg(
        F.max("n_months").cast("long").alias("n_months"),
        F.sum(F.col("d") * F.col("d")).alias("den"),
        *[
            F.sum(F.col("d") * F.col(f"dlag{k}")).alias(f"num{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), num{k}" for k in range(1, _ACF_LAGS + 1)
    )
    return g.select(
        "l_returnflag",
        "n_months",
        F.expr(f"stack({_ACF_LAGS}, {stack_args}) AS (lag_k, num)"),
        F.col("den"),
    ).select(
        "l_returnflag",
        "n_months",
        "lag_k",
        (F.col("num").cast("double") / F.col("den").cast("double")).alias("acf"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint: where did the daily level of each event stream shift?
# --------------------------------------------------------------------------
@query(
    "cusum_changepoint",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type,
               count(*) AS n_days,
               CAST(sum(c) AS HUGEINT) AS s_total
        FROM m GROUP BY 1
    ), d AS (
        SELECT m.event_type, m.day_id, st.n_days,
               CAST(st.n_days AS HUGEINT) * m.c - st.s_total AS d
        FROM m JOIN st USING (event_type)
    ), p AS (
        SELECT event_type, day_id, n_days,
               abs(sum(d) OVER (PARTITION BY event_type ORDER BY day_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)) AS abs_p
        FROM d
    )
    SELECT event_type,
           CAST(max(n_days) AS BIGINT) AS n_days,
           first(day_id ORDER BY abs_p DESC, day_id ASC) AS cp_day_id,
           -- VARCHAR route: DuckDB HUGEINT->DOUBLE is not correctly rounded.
           CAST(CAST(max(abs_p) AS VARCHAR) AS DOUBLE)
               / (max(n_days) * 100.0) AS max_cusum_value
    FROM p GROUP BY event_type
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event stream: the cumulative sum of
    mean-centered daily totals peaks (in absolute value) at the most
    likely level-shift day — the classic offline change-in-mean statistic
    a data-quality monitor runs over ingest volume.

    Exactness discipline: deviations are scaled by n (d_t = n*c_t - S,
    integer — same trick as autocorr_lags) so the running prefix sums stay
    exact integers in DECIMAL(38,0)/HUGEINT; the reported statistic
    divides back by n*100 once, and the argmax day is picked by
    (abs_p DESC, day_id ASC) — a total order, so ties can't flip between
    engines.

    Scale posture: one partial-aggregatable shuffle builds the daily
    rollup; the prefix-sum window runs per event_type over a
    calendar-bounded series (days, not events). State is O(days) however
    large the stream gets."""
    ev = load_table(spark, sf_dir, "events")
    m = (
        ev.select(
            "event_type",
            # ts is int64 nanos (sources/parquet.py); pmod+div floor-aligns
            # exactly — same discipline as functions/timeutil.floor_bucket_s.
            F.expr(
                "(ts - pmod(ts, 86400000000000)) div 86400000000000"
            ).alias("day_id"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type", "day_id")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    st = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").cast("decimal(38,0)").alias("s_total"),
    )
    d = m.join(F.broadcast(st), "event_type").select(
        "event_type",
        "day_id",
        "n_days",
        (
            F.col("n_days").cast("decimal(38,0)") * F.col("c")
            - F.col("s_total")
        ).alias("d"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.select(
        "event_type",
        "day_id",
        "n_days",
        F.abs(F.sum("d").over(w)).alias("abs_p"),
    )
    return p.groupBy("event_type").agg(
        F.max("n_days").cast("long").alias("n_days"),
        F.min(F.struct(-F.col("abs_p"), F.col("day_id")))["day_id"].alias(
            "cp_day_id"
        ),
        (
            F.max("abs_p").cast("double") / (F.max("n_days") * F.lit(100.0))
        ).alias("max_cusum_value"),
    )


# --------------------------------------------------------------------------
# Seasonally-adjusted anomaly flags over the decomposition residuals.
# --------------------------------------------------------------------------
ANOM_Z = 2.0


def _seasonal_anomaly_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH dec AS MATERIALIZED ({ORACLES['seasonal_decompose_monthly']}),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list_sort(list(struct_pack(m := month_id, r := residual)))
                   AS lst
        FROM dec WHERE residual IS NOT NULL
    ), mu AS (
        SELECT n, lst,
               list_reduce([0.0] || list_transform(lst, x -> x.r),
                           (a, b) -> a + b) / n AS mean_r
        FROM l
    ), sd AS (
        SELECT n, mean_r,
               sqrt(list_reduce(
                   [0.0] || list_transform(lst, x -> (x.r - mean_r)
                                                    * (x.r - mean_r)),
                   (a, b) -> a + b) / (n - 1.0)) AS sd_r
        FROM mu
    )
    SELECT d.month_id, d.residual,
           round((d.residual - s.mean_r) / s.sd_r, 6) AS zscore,
           CASE WHEN abs((d.residual - s.mean_r) / s.sd_r) > {ANOM_Z}
                THEN 1 ELSE 0 END AS is_anomaly
    FROM dec d CROSS JOIN sd s
    WHERE d.residual IS NOT NULL
    """


@query("seasonal_residual_anomaly", oracle=_seasonal_anomaly_oracle())
def seasonal_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: z-score the residual
    component of the registered STL-lite decomposition and flag months
    beyond 2 sigma — the "is this month actually unusual, or just
    December?" question that a raw-revenue z-score (anomaly_zscore)
    cannot answer because seasonality dominates its variance. Composes
    seasonal_decompose_monthly, so trend/seasonal definitions can never
    drift between the decomposition and its monitor.

    Determinism: residuals are already 6-dp-rounded exact-integer-
    derived values; the mean and variance fold in sorted month order
    (calendar-bounded, the entropy_fold discipline); the z-score rounds
    to 6 dp; the threshold compares the UNROUNDED z on both engines.

    Plan: the composed decomposition dominates (fact-scale month
    rollup); this adds one calendar-sized fold and a broadcast
    crossJoin back over ~84 rows."""
    from ..registry import QUERIES

    dec = (
        QUERIES["seasonal_decompose_monthly"](spark, sf_dir)
        .filter(F.col("residual").isNotNull())
        .coalesce(1)
        .persist()
    )
    dec.count()
    l = dec.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("month_id").alias("m"),
                                    F.col("residual").alias("r")))
        ).alias("lst"),
    )
    mu = l.select(
        "n",
        "lst",
        (
            F.expr(
                "aggregate(transform(lst, x -> x.r),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / F.col("n")
        ).alias("mean_r"),
    )
    sd = mu.select(
        "mean_r",
        F.sqrt(
            F.expr(
                "aggregate(transform(lst,"
                " x -> (x.r - mean_r) * (x.r - mean_r)),"
                " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
            )
            / (F.col("n") - F.lit(1.0))
        ).alias("sd_r"),
    )
    z = (F.col("residual") - F.col("mean_r")) / F.col("sd_r")
    return dec.crossJoin(F.broadcast(sd)).select(
        "month_id",
        "residual",
        F.round(z, 6).alias("zscore"),
        F.when(F.abs(z) > ANOM_Z, F.lit(1)).otherwise(F.lit(0)).alias(
            "is_anomaly"
        ),
    )


# --------------------------------------------------------------------------
# Theil–Sen robust trend: median of pairwise slopes over the monthly series.
# --------------------------------------------------------------------------
@query(
    "theil_sen_trend",
    oracle="""
    WITH m AS (
        SELECT (year(CAST(o_orderdate AS DATE)) * 12
                + month(CAST(o_orderdate AS DATE)) - 1) AS month_id,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), pairs AS (
        SELECT CAST(b.cents - a.cents AS DOUBLE)
                   / (b.month_id - a.month_id) AS sl
        FROM m a JOIN m b ON b.month_id > a.month_id
    ), sarr AS (
        SELECT list_sort(list(sl)) AS arr,
               CAST(count(*) AS BIGINT) AS np
        FROM pairs
    ), med AS (
        SELECT np,
               CASE WHEN np % 2 = 1 THEN arr[(np + 1) // 2]
                    ELSE (arr[np // 2] + arr[np // 2 + 1]) / 2.0
               END AS slope
        FROM sarr
    ), dev AS (
        SELECT list_sort(list(m.cents - med.slope * m.month_id)) AS darr,
               CAST(count(*) AS BIGINT) AS nm,
               max(med.slope) AS slope
        FROM m CROSS JOIN med
    )
    SELECT nm AS n_months, slope AS slope_cents_per_month,
           CASE WHEN nm % 2 = 1 THEN darr[(nm + 1) // 2]
                ELSE (darr[nm // 2] + darr[nm // 2 + 1]) / 2.0
           END AS intercept_cents
    FROM dev
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator over the monthly revenue series: slope =
    median of all pairwise slopes, intercept = median of residual
    offsets — the robust trend line that a single anomalous month
    cannot bend (OLS breaks down at one outlier; Theil–Sen tolerates
    ~29%). Complements seasonal_residual_anomaly: one flags the weird
    months, this reports the trend as if they weren't there.

    Exactness: monthly cents are exact integers, each pairwise slope is
    ONE exact-rounded division, and both medians are order-statistic
    SELECTIONS from sorted bounded arrays (months², i.e. ~3.5 k pairs
    for 7 years — calendar-bounded, never fact-scale), with the even-n
    midpoint average the only other float op — bit-identical engines.

    Plan: one fact-scale month rollup (the only heavy step), then a
    calendar-sized self-join, one bounded sorted fold for each median,
    and a 1-row broadcast of the slope into the intercept pass. At any
    corpus size the post-rollup work is constant."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.select(
            (
                F.year(F.col("o_orderdate")) * 12
                + F.month(F.col("o_orderdate"))
                - 1
            ).alias("month_id"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("month_id")
        .agg(F.sum("c").cast("long").alias("cents"))
        .coalesce(1)
        .persist()
    )
    m.count()  # pairs self-join AND the intercept pass read it
    a = m.select(F.col("month_id").alias("ma"), F.col("cents").alias("ca"))
    b = m.select(F.col("month_id").alias("mb"), F.col("cents").alias("cb"))
    pairs = (
        a.join(b, F.col("mb") > F.col("ma"))
        .select(
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("mb") - F.col("ma"))
            ).alias("sl")
        )
    )
    med = pairs.agg(
        F.sort_array(F.collect_list("sl")).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("np"),
    ).select(
        "np",
        F.expr(
            "CASE WHEN np % 2 = 1 THEN arr[CAST((np + 1) div 2 AS INT) - 1]"
            " ELSE (arr[CAST(np div 2 AS INT) - 1]"
            "       + arr[CAST(np div 2 AS INT)]) / 2.0 END"
        ).alias("slope"),
    )
    dev = (
        m.crossJoin(F.broadcast(med))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.col("cents") - F.col("slope") * F.col("month_id")
                )
            ).alias("darr"),
            F.count(F.lit(1)).cast("long").alias("nm"),
            F.max("slope").alias("slope"),
        )
    )
    return dev.select(
        F.col("nm").alias("n_months"),
        F.col("slope").alias("slope_cents_per_month"),
        F.expr(
            "CASE WHEN nm % 2 = 1 THEN darr[CAST((nm + 1) div 2 AS INT) - 1]"
            " ELSE (darr[CAST(nm div 2 AS INT) - 1]"
            "       + darr[CAST(nm div 2 AS INT)]) / 2.0 END"
        ).alias("intercept_cents"),
    )


# --------------------------------------------------------------------------
# Hodges–Lehmann location: the rank-based robust center of the monthly
# revenue series — Theil–Sen's location-estimate sibling.
# --------------------------------------------------------------------------
@query(
    "hodges_lehmann_location",
    oracle="""
    WITH m AS (
        SELECT (year(CAST(o_orderdate AS DATE)) * 12
                + month(CAST(o_orderdate AS DATE)) - 1) AS month_id,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), walsh AS (
        SELECT CAST(a.cents + b.cents AS BIGINT) AS w
        FROM m a JOIN m b ON b.month_id >= a.month_id
    ), arr AS (
        SELECT CAST(count(*) AS BIGINT) AS np, list_sort(list(w)) AS ws
        FROM walsh
    ), mm AS (
        SELECT CAST(count(*) AS BIGINT) AS n_months FROM m
    )
    SELECT mm.n_months, arr.np AS n_walsh_pairs,
           CASE WHEN np % 2 = 1 THEN CAST(ws[(np + 1) // 2] AS DOUBLE) / 2.0
                ELSE CAST(ws[np // 2] + ws[np // 2 + 1] AS DOUBLE) / 4.0
           END AS hl_cents
    FROM arr CROSS JOIN mm
    """,
)
def hodges_lehmann_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann estimator of the monthly-revenue center: the
    median of all Walsh averages (x_i + x_j)/2 over month pairs i ≤ j —
    the location estimate the Wilcoxon signed-rank test inverts, with
    ~29% breakdown and far better efficiency than the plain median at
    near-normal data. Completes the robust-trend toolkit: Theil–Sen is
    the robust SLOPE, Mann–Kendall the trend TEST, this the robust
    LEVEL — the triple a volume dashboard reports together.

    Exactness: Walsh sums stay INTEGER cents (the /2 defers to the
    single final division — even-count medians divide the integer sum
    of the two middle Walsh sums by 4); the median is an order-statistic
    SELECTION from a sorted bounded array, so engines agree
    bit-for-bit.

    Plan: one fact-scale month rollup, then a calendar-bounded
    (months²/2 ≈ 3.3k for 7 years) self-join and ONE bounded sorted
    fold — constant post-rollup work at any SF (theil_sen_trend's
    posture)."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.select(
            (
                F.year(F.col("o_orderdate")) * 12
                + F.month(F.col("o_orderdate"))
                - 1
            ).alias("month_id"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("month_id")
        .agg(F.sum("c").cast("long").alias("cents"))
        .coalesce(1)
        .persist()
    )
    m.count()  # the Walsh self-join and the month count both read it
    a = m.select(F.col("month_id").alias("ma"), F.col("cents").alias("ca"))
    b = m.select(F.col("month_id").alias("mb"), F.col("cents").alias("cb"))
    walsh = a.join(b, F.col("mb") >= F.col("ma")).select(
        (F.col("ca") + F.col("cb")).cast("long").alias("w")
    )
    arr = walsh.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sort_array(F.collect_list("w")).alias("ws"),
    )
    nm = m.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return arr.crossJoin(F.broadcast(nm)).select(
        "n_months",
        F.col("np").alias("n_walsh_pairs"),
        F.expr(
            "CASE WHEN np % 2 = 1 THEN"
            " CAST(ws[CAST((np + 1) div 2 AS INT) - 1] AS DOUBLE) / 2.0"
            " ELSE CAST(ws[CAST(np div 2 AS INT) - 1]"
            "           + ws[CAST(np div 2 AS INT)] AS DOUBLE) / 4.0 END"
        ).alias("hl_cents"),
    )


# --------------------------------------------------------------------------
# Mann–Kendall trend test: the nonparametric "is there a monotonic trend"
# companion to Theil–Sen's "how steep is it".
# --------------------------------------------------------------------------
@query(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(sum(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM daily a JOIN daily b ON b.d > a.d
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
    ), ties AS (
        SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY c)
        WHERE t > 1
    )
    SELECT n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var18,
           CASE WHEN s.s_stat > 0 THEN
                    CAST(s.s_stat - 1 AS DOUBLE)
                    / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term AS DOUBLE) / 18.0)
                WHEN s.s_stat < 0 THEN
                    CAST(s.s_stat + 1 AS DOUBLE)
                    / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                                - ties.tie_term AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z
    FROM s CROSS JOIN n CROSS JOIN ties
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test over the daily event-count
    series: S = Σ_{i<j} sgn(c_j − c_i) with the tie-corrected variance
    Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and the continuity-
    corrected z. Theil–Sen reports the robust slope; this reports
    whether ANY monotonic trend is significant without assuming
    linearity or a distribution — the pair is the standard robust-trend
    toolkit for pipeline-volume monitoring.

    Exactness: S, n, and Var·18 are pure integer algebra (the pairwise
    sgn sum is an order-free integer fold); z is one division by
    sqrt(var18/18) — sqrt is correctly rounded on both engines (the
    engine-exactness rule SCALE.md records), so the chains match
    bit-for-bit.

    Plan: ONE fact-scale groupBy collapses events to calendar days;
    the S self-join and the tie rollup run on the day table — bounded
    by elapsed time, never by corpus rows (a year is 366 rows whether
    the day holds 1e3 or 1e9 events). Day numbers use the epoch-nanos
    floor-div idiom (load_table normalizes ts to int64 nanos; DuckDB
    reads the raw TIMESTAMP, hence floor(epoch/86400) there)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "(ts - pmod(ts, 86400000000000)) div 86400000000000"
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .coalesce(1)
        .persist()
    )
    daily.count()  # the S self-join, n, and tie rollup all read it
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    s = a.join(b, F.col("db") > F.col("da")).agg(
        F.sum(
            F.when(F.col("cb") > F.col("ca"), 1)
            .when(F.col("cb") < F.col("ca"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("long")
    denom = F.sqrt(var18.cast("double") / F.lit(18.0))
    return (
        s.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            var18.alias("var18"),
            F.when(
                F.col("s_stat") > 0,
                (F.col("s_stat") - 1).cast("double") / denom,
            )
            .when(
                F.col("s_stat") < 0,
                (F.col("s_stat") + 1).cast("double") / denom,
            )
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan–Meier survival estimator with right-censoring.
# --------------------------------------------------------------------------
_KM_DAY_NS = 86_400_000_000_000
# "conversion" = a purchase whose integer cents land on the 1-in-20 grid —
# a deterministic ~5% slice of purchases, so a healthy share of users never
# convert and genuinely exercise the censoring path at every SF
_KM_EVENT = (
    "event_type = 'purchase' AND CAST(round(value * 100) AS BIGINT) % 20 = 0"
)

_KM_SPANS_SQL = f"""per_user AS (
        SELECT user_id,
               min(epoch_ns(ts)) AS first_ns,
               max(epoch_ns(ts)) AS last_ns,
               min(epoch_ns(ts)) FILTER (WHERE {_KM_EVENT}) AS q_ns
        FROM events GROUP BY user_id
    ), spans AS (
        SELECT user_id % 2 AS arm,
               (coalesce(q_ns, last_ns) - first_ns) // {_KM_DAY_NS}
                   AS dur_days,
               CASE WHEN q_ns IS NOT NULL THEN 1 ELSE 0 END AS observed
        FROM per_user
    )"""


def _km_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, dur_days, observed): time from first activity to first
    qualifying purchase (observed) or to last activity (right-censored —
    the user may still convert after the corpus window closes)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ns"),
        F.max("ts").alias("last_ns"),
        F.min(F.when(F.expr(_KM_EVENT), F.col("ts"))).alias("q_ns"),
    )
    return per_user.select(
        (F.col("user_id") % 2).alias("arm"),
        F.expr(
            f"(coalesce(q_ns, last_ns) - first_ns) div {_KM_DAY_NS}"
        ).alias("dur_days"),
        F.col("q_ns").isNotNull().cast("int").alias("observed"),
    )


@query(
    "survival_kaplan_meier",
    oracle=f"""
    WITH {_KM_SPANS_SQL}, hist AS (
        SELECT dur_days,
               CAST(count(*) AS BIGINT) AS c_total,
               CAST(sum(observed) AS BIGINT) AS d
        FROM spans GROUP BY dur_days
    ), risk AS (
        SELECT dur_days, c_total, d,
               (SELECT CAST(count(*) AS BIGINT) FROM spans)
                   - CAST(coalesce(sum(c_total) OVER (
                         ORDER BY dur_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS n_at_risk
        FROM hist
    ), surv AS (
        SELECT dur_days, d, n_at_risk,
               round(exp(sum(ln(1.0 - CAST(d AS DOUBLE) / n_at_risk))
                         OVER (ORDER BY dur_days)), 6) AS survival
        FROM risk
    )
    SELECT dur_days, n_at_risk, d AS n_events, survival
    FROM surv WHERE d > 0
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-conversion curve WITH right-censoring — the
    estimator a raw conversion-delay histogram cannot replace once some
    users haven't converted yet: duration runs from first activity to
    the first qualifying (1-in-20-cents) purchase, and a user with no
    such purchase is CENSORED at their last activity (their true
    conversion time is only known to exceed the span), leaving the risk
    set without counting as an event. S(t) = Π_{{s<=t}} (1 − d_s/n_s)
    over observed conversion days — the curve every funnel/retention
    analysis actually reports. ~40-70% of fixture users are censored at
    every SF, so the censoring arithmetic is genuinely exercised.

    Determinism: risk sets and event counts are exact integers from one
    duration histogram; the product accumulates as a cumulative ln-sum
    window in duration order (deterministic frame order on distinct
    keys) and rounds to 6 dp — the entropy_fold treatment of an
    inherently-float product. A step where everyone remaining converts
    drives ln(0) → −inf → S = 0 identically on both engines.

    Plan: one user-keyed min/max/conditional-min pass over the fact
    table, then everything runs on the DURATION HISTOGRAM —
    day-cardinality, not user-cardinality; the cumulative windows are
    single-partition over that bounded support (the ks_two_sample
    posture)."""
    spans = _km_spans(spark, sf_dir)
    n_total = spans.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    hist = spans.groupBy("dur_days").agg(
        F.count(F.lit(1)).cast("long").alias("c_total"),
        F.sum("observed").cast("long").alias("d"),
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = hist.crossJoin(F.broadcast(n_total)).withColumn(
        "n_at_risk",
        F.col("n_total")
        - F.coalesce(F.sum("c_total").over(w_prev), F.lit(0)),
    )
    surv = risk.withColumn(
        "survival",
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        F.lit(1.0)
                        - F.col("d").cast("double") / F.col("n_at_risk")
                    )
                ).over(w_cum)
            ),
            6,
        ),
    )
    return surv.filter(F.col("d") > 0).select(
        "dur_days", "n_at_risk", F.col("d").alias("n_events"), "survival"
    )


# --------------------------------------------------------------------------
# Log-rank test: do the two experiment arms convert on the same schedule?
# --------------------------------------------------------------------------
@query(
    "survival_logrank_test",
    oracle=f"""
    WITH {_KM_SPANS_SQL}, hist AS (
        SELECT dur_days,
               CAST(count(*) AS BIGINT) AS c_all,
               CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS c1,
               CAST(sum(observed) AS BIGINT) AS d_all,
               CAST(coalesce(sum(observed) FILTER (WHERE arm = 1), 0)
                    AS BIGINT) AS d1
        FROM spans GROUP BY dur_days
    ), risk AS (
        SELECT dur_days, d_all, d1,
               (SELECT CAST(count(*) AS BIGINT) FROM spans)
                   - CAST(coalesce(sum(c_all) OVER w, 0) AS BIGINT) AS n_all,
               (SELECT CAST(count(*) AS BIGINT) FROM spans WHERE arm = 1)
                   - CAST(coalesce(sum(c1) OVER w, 0) AS BIGINT) AS n1
        FROM hist
        WINDOW w AS (ORDER BY dur_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), terms AS (
        SELECT dur_days,
               d1 - d_all * (CAST(n1 AS DOUBLE) / n_all) AS u_t,
               CASE WHEN n_all > 1 THEN
                   d_all * (CAST(n1 AS DOUBLE) / n_all)
                         * (1.0 - CAST(n1 AS DOUBLE) / n_all)
                         * (n_all - d_all) / (n_all - 1.0)
               ELSE 0.0 END AS v_t
        FROM risk WHERE d_all > 0
    ), folded AS (
        SELECT CAST(count(*) AS BIGINT) AS n_event_times,
               list_reduce([0.0] || list_transform(
                   list_sort(list(struct_pack(t := dur_days, u := u_t))),
                   x -> x.u), (a, b) -> a + b) AS u,
               list_reduce([0.0] || list_transform(
                   list_sort(list(struct_pack(t := dur_days, v := v_t))),
                   x -> x.v), (a, b) -> a + b) AS v
        FROM terms
    )
    SELECT n_event_times, round(u, 6) AS observed_minus_expected,
           round(u / nullif(sqrt(v), 0.0), 6) AS z_stat
    FROM folded
    """,
)
def survival_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two experiment arms' time-to-conversion
    curves — the hypothesis test that belongs next to
    survival_kaplan_meier (the curve) and ab_test_proportions (the
    end-state rate): does arm 1 convert on a different SCHEDULE,
    accounting for censoring, not just at a different final rate?
    U = Σ_t (d1_t − d_t·n1_t/n_t), V = Σ_t d_t·(n1/n)(1−n1/n)(n−d)/(n−1),
    z = U/√V — the standard Mantel–Haenszel form.

    Determinism: risk sets and event counts per (time, arm) are exact
    integers off ONE duration histogram; each per-time term is a pinned
    rational expression; the two sums fold in sorted event-time order
    (day-cardinality bounded — the entropy_fold discipline) and round
    to 6 dp. Degenerate single-arm data nulls the z via nullif.

    Plan: identical to survival_kaplan_meier's — one user-keyed pass,
    then day-histogram-sized windows and folds; the arm split adds two
    conditional sums to aggregations that already run."""
    spans = _km_spans(spark, sf_dir).persist()
    totals = spans.agg(
        F.count(F.lit(1)).cast("long").alias("nt_all"),
        F.sum((F.col("arm") == 1).cast("int")).cast("long").alias("nt_1"),
    )
    hist = spans.groupBy("dur_days").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum((F.col("arm") == 1).cast("int")).cast("long").alias("c1"),
        F.sum("observed").cast("long").alias("d_all"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == 1, F.col("observed"))), F.lit(0)
        )
        .cast("long")
        .alias("d1"),
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = hist.crossJoin(F.broadcast(totals)).select(
        "dur_days",
        "d_all",
        "d1",
        (
            F.col("nt_all")
            - F.coalesce(F.sum("c_all").over(w_prev), F.lit(0))
        ).alias("n_all"),
        (
            F.col("nt_1") - F.coalesce(F.sum("c1").over(w_prev), F.lit(0))
        ).alias("n1"),
    )
    p1 = F.col("n1").cast("double") / F.col("n_all")
    terms = risk.filter(F.col("d_all") > 0).select(
        "dur_days",
        (F.col("d1") - F.col("d_all") * p1).alias("u_t"),
        F.when(
            F.col("n_all") > 1,
            F.col("d_all")
            * p1
            * (F.lit(1.0) - p1)
            * (F.col("n_all") - F.col("d_all"))
            / (F.col("n_all") - F.lit(1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("v_t"),
    )
    folded = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(dur_days AS t, u_t AS u))), x -> x.u),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("u"),
        F.expr(
            "aggregate(transform(sort_array(collect_list("
            "struct(dur_days AS t, v_t AS v))), x -> x.v),"
            " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("v"),
    )
    return folded.select(
        "n_event_times",
        F.round("u", 6).alias("observed_minus_expected"),
        F.round(
            F.col("u") / F.nullif(F.sqrt(F.col("v")), F.lit(0.0)), 6
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Monitored rate with Wilson confidence bounds — the alerting primitive.
# --------------------------------------------------------------------------
_WILSON_Z2 = 3.8416  # z² for z = 1.96 as an exact-decimal literal


@query(
    "monthly_return_rate_wilson",
    oracle=f"""
    WITH m AS (
        SELECT (year(CAST(l_shipdate AS DATE)) * 12
                + month(CAST(l_shipdate AS DATE)) - 1) AS month_id,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                   AS n_returned
        FROM lineitem GROUP BY 1
    )
    SELECT month_id, n_items, n_returned,
           CAST(n_returned AS DOUBLE) / n_items AS rate,
           (CAST(n_returned AS DOUBLE) / n_items
                + {_WILSON_Z2} / (2.0 * n_items)
            - sqrt({_WILSON_Z2})
              * sqrt((CAST(n_returned AS DOUBLE) / n_items)
                     * (1.0 - CAST(n_returned AS DOUBLE) / n_items)
                         / n_items
                     + {_WILSON_Z2} / (4.0 * n_items * n_items)))
               / (1.0 + {_WILSON_Z2} / n_items) AS wilson_lo,
           (CAST(n_returned AS DOUBLE) / n_items
                + {_WILSON_Z2} / (2.0 * n_items)
            + sqrt({_WILSON_Z2})
              * sqrt((CAST(n_returned AS DOUBLE) / n_items)
                     * (1.0 - CAST(n_returned AS DOUBLE) / n_items)
                         / n_items
                     + {_WILSON_Z2} / (4.0 * n_items * n_items)))
               / (1.0 + {_WILSON_Z2} / n_items) AS wilson_hi
    FROM m
    """,
)
def monthly_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return rate with 95% Wilson score bounds — the monitored-
    rate primitive an alerting rule fires on: unlike the naive normal
    interval, Wilson stays inside [0,1] and behaves at small n, so a
    thin month can't produce a nonsense band. Rate plus band per month;
    an alert is "this month's band excludes the trailing baseline".

    Exactness: counts are exact integers from one scan; z² rides as the
    exact decimal literal 3.8416 (writing 1.96² avoids any pow()
    library call), and the entire bound is a pinned chain of
    exact-rounded IEEE ops — both engines agree bitwise, no rounding
    needed anywhere.

    Plan: ONE month-keyed count aggregation with a scan-stage
    conditional; everything else is per-row closed-form arithmetic on
    the calendar-sized result."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            (
                F.year(F.col("l_shipdate")) * 12
                + F.month(F.col("l_shipdate"))
                - 1
            ).alias("month_id"),
            (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        )
        .groupBy("month_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("ret").cast("long").alias("n_returned"),
        )
    )
    p = F.col("n_returned").cast("double") / F.col("n_items")
    n = F.col("n_items")
    z2 = F.lit(_WILSON_Z2)
    center = p + z2 / (F.lit(2.0) * n)
    half = F.sqrt(z2) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return m.select(
        "month_id",
        "n_items",
        "n_returned",
        p.alias("rate"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


# --------------------------------------------------------------------------
# Weekly harmonic (Fourier) fit of daily event volume — trig-free: the 7
# day-of-week sin/cos regressor values are Python-computed fixed-point
# literals, so NO engine ever evaluates a trig function.
# --------------------------------------------------------------------------
_FOURIER_DAY_NS = 86_400_000_000_000
_FOURIER_GRID = 1 << 20


def _fourier_tables() -> tuple[list[int], list[int]]:
    import math

    s = [
        int(math.floor(math.sin(2.0 * math.pi * d / 7.0) * _FOURIER_GRID + 0.5))
        for d in range(7)
    ]
    c = [
        int(math.floor(math.cos(2.0 * math.pi * d / 7.0) * _FOURIER_GRID + 0.5))
        for d in range(7)
    ]
    return s, c


_F_SIN, _F_COS = _fourier_tables()


def _dow_case(table: list[int]) -> str:
    whens = " ".join(f"WHEN {d} THEN {v}" for d, v in enumerate(table))
    return f"(CASE dow {whens} END)"


@query(
    "seasonal_fourier_fit",
    oracle=f"""
    WITH d AS (
        SELECT epoch_ns(ts) // {_FOURIER_DAY_NS} AS day,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY day
    ), reg AS (
        SELECT y, CAST({_dow_case(_F_SIN).replace('dow', '(day % 7)')}
                       AS BIGINT) AS s,
               CAST({_dow_case(_F_COS).replace('dow', '(day % 7)')}
                    AS BIGINT) AS c
        FROM d
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(s AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(sum(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS s2,
               CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(sum(CAST(s AS DECIMAL(38,0)) * s) AS DOUBLE) AS s11,
               CAST(sum(CAST(s AS DECIMAL(38,0)) * c) AS DOUBLE) AS s12,
               CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE) AS s22,
               CAST(sum(CAST(s AS DECIMAL(38,0)) * y) AS DOUBLE) AS s1y,
               CAST(sum(CAST(c AS DECIMAL(38,0)) * y) AS DOUBLE) AS s2y,
               CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM reg
    ), dets AS (
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
    SELECT n AS n_days,
           det0 / det AS mean_level,
           sqrt((det1 / det) * (det1 / det)
                + (det2 / det) * (det2 / det)) * {float(_FOURIER_GRID)!r}
               AS weekly_amplitude,
           1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
                      - (det2 / det) * s2y)
                 / nullif(syy - sy * (sy / n), 0.0) AS r2
    FROM dets
    """,
)
def seasonal_fourier_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-harmonic weekly seasonality of daily event volume: regress
    daily counts on sin/cos of the day-of-week phase (harmonic
    regression — the parametric sibling of seasonal_decompose_monthly's
    nonparametric dow means). mean_level is the fitted intercept,
    weekly_amplitude the peak deviation of the fitted sinusoid (in
    events/day), r2 the share of daily variance the weekly cycle
    explains.

    Trig-free determinism: the only 7 possible regressor values
    sin/cos(2πd/7) are computed ONCE in Python, fixed-point-quantized to
    2^-20, and emitted as CASE literals into BOTH engines — no engine
    trig call, so cross-libm drift is impossible by construction. From
    there the whole fit is ols_two_feature's machinery: exact DECIMAL
    moments, pinned Cramer determinants, pinned R² assembly, and one
    final sqrt for the amplitude.

    Plan: ONE day-keyed rollup collapses events to ≤ a-few-hundred daily
    rows; the moment pass and 1-row Cramer arithmetic are calendar-
    scale. Scan-bound at any SF."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr(f"ts div {_FOURIER_DAY_NS}").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    sin_case = F.expr(
        "CAST(" + _dow_case(_F_SIN).replace("dow", "(day % 7)") + " AS BIGINT)"
    )
    cos_case = F.expr(
        "CAST(" + _dow_case(_F_COS).replace("dow", "(day % 7)") + " AS BIGINT)"
    )
    reg = d.select("y", sin_case.alias("s"), cos_case.alias("c"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    dsum = lambda e: F.sum(e).cast("double")
    m = reg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(dec("s")).alias("s1"),
        dsum(dec("c")).alias("s2"),
        dsum(dec("y")).alias("sy"),
        dsum(dec("s") * F.col("s")).alias("s11"),
        dsum(dec("s") * F.col("c")).alias("s12"),
        dsum(dec("c") * F.col("c")).alias("s22"),
        dsum(dec("s") * F.col("y")).alias("s1y"),
        dsum(dec("c") * F.col("y")).alias("s2y"),
        dsum(dec("y") * F.col("y")).alias("syy"),
    )
    n, s1, s2, sy = (F.col(x) for x in ("n", "s1", "s2", "sy"))
    s11, s12, s22 = (F.col(x) for x in ("s11", "s12", "s22"))
    s1y, s2y, syy = (F.col(x) for x in ("s1y", "s2y", "syy"))
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
        F.col("n").alias("n_days"),
        b0.alias("mean_level"),
        (F.sqrt(b1 * b1 + b2 * b2) * F.lit(float(_FOURIER_GRID))).alias(
            "weekly_amplitude"
        ),
        (F.lit(1.0) - sse / F.nullif(sst, F.lit(0.0))).alias("r2"),
    )


# --------------------------------------------------------------------------
# Rolling-origin forecast backtest of the seasonal-naive baseline — the
# honest-error floor every forecasting pipeline must beat.
# --------------------------------------------------------------------------
_BT_LAG_DAYS = 7  # seasonal-naive: forecast(d) = actual(d - 7)


@query(
    "forecast_backtest_naive",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), f AS (
        SELECT event_type, day_id, c,
               lag(c, {_BT_LAG_DAYS}) OVER (PARTITION BY event_type
                                            ORDER BY day_id) AS fc
        FROM m
    ), e AS (
        SELECT event_type, c, fc, abs(c - fc) AS ae
        FROM f WHERE fc IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(CAST(sum(ae) AS BIGINT) AS DOUBLE) / count(*) AS mae_cents,
           CAST(CAST(sum(ae) AS BIGINT) AS DOUBLE)
               / CAST(sum(abs(c)) AS BIGINT) AS wape
    FROM e GROUP BY event_type
    """,
)
def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive baseline (forecast
    for day d = the actual from d−7) on daily revenue per event stream:
    MAE in cents and WAPE (Σ|err| / Σ|actual| — the scale-free number
    that survives zero-revenue days where MAPE blows up). Every
    forecasting pipeline reports its model AGAINST this floor; a model
    that can't beat seasonal-naive on WAPE is not a model. Day gaps are
    intentionally NOT filled here: lag(7) is seven OBSERVED days back,
    and the gapfill_locf operator is the registered composition point
    when calendar-exact lags are required.

    Exactness: daily totals, the lagged forecast, and every absolute
    error are exact integers end to end; MAE and WAPE are each ONE
    division of exact integers — nothing to diverge.

    Plan: one (type, day)-keyed partial-aggregatable pass, a lag window
    over the calendar-bounded per-type series, one type-keyed rollup —
    state is O(days), never O(events)."""
    ev = load_table(spark, sf_dir, "events")
    m = (
        ev.select(
            "event_type",
            F.expr(
                "(ts - pmod(ts, 86400000000000)) div 86400000000000"
            ).alias("day_id"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
        )
        .groupBy("event_type", "day_id")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day_id")
    e = (
        m.select(
            "event_type",
            "c",
            F.lag("c", _BT_LAG_DAYS).over(w).alias("fc"),
        )
        .filter(F.col("fc").isNotNull())
        .select("event_type", "c", F.abs(F.col("c") - F.col("fc")).alias("ae"))
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (
            F.sum("ae").cast("long").cast("double") / F.count(F.lit(1))
        ).alias("mae_cents"),
        (
            F.sum("ae").cast("long").cast("double")
            / F.sum(F.abs("c")).cast("long")
        ).alias("wape"),
    )


# --------------------------------------------------------------------------
# Distribution-free median CI: order-statistic bounds from the binomial —
# no variance estimate, no normality, just ranks.
# --------------------------------------------------------------------------
_MCI_Z = "1.959963984540054"  # z_{0.975}, shared literal


@query(
    "median_order_ci",
    oracle=f"""
    WITH v AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
                            l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ), k AS (
        SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
               CAST(floor((max(n) - {_MCI_Z} * sqrt(CAST(max(n) AS DOUBLE)))
                          / 2) AS BIGINT) AS klo,
               CAST(ceil(1 + (max(n) + {_MCI_Z}
                              * sqrt(CAST(max(n) AS DOUBLE))) / 2)
                    AS BIGINT) AS khi
        FROM v GROUP BY l_returnflag
    )
    SELECT v.l_returnflag, k.n, k.klo, k.khi,
           max(CASE WHEN v.rn = (k.n + 1) // 2 THEN v.cents END)
               AS median_lo_cents,
           max(CASE WHEN v.rn = k.klo THEN v.cents END) AS ci_lo_cents,
           max(CASE WHEN v.rn = k.khi THEN v.cents END) AS ci_hi_cents
    FROM v JOIN k ON k.l_returnflag = v.l_returnflag
    GROUP BY v.l_returnflag, k.n, k.klo, k.khi
    """,
)
def median_order_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median of
    per-group price: the CI bounds are the order statistics at ranks
    floor((n − z√n)/2) and ceil(1 + (n + z√n)/2) — the binomial
    (sign-test inversion) interval that needs NO variance estimate and
    NO normality, the right uncertainty statement for skewed money
    columns where a mean ± z·se interval is meaningless. Reported next
    to the lower-median order statistic itself.

    Exactness: ranks carry a total order (cents, orderkey, linenumber);
    the rank cutoffs use the shared z literal and IEEE sqrt (correctly
    rounded, engine-exact) before floor/ceil to exact integers; every
    reported value is a SELECTION of an actual data value — no
    interpolation, no float aggregation.

    Plan: one group-partitioned rank window over the fact table, a
    group-keyed cutoff rollup, a broadcast join back, rank-equality
    selections. At 100 TB the rank window swaps for
    global_rank_two_phase's bucket ranks."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = v.select(
        "l_returnflag",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = ranked.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n"),
        F.expr(
            f"CAST(floor((max(n) - {_MCI_Z} * sqrt(CAST(max(n) AS DOUBLE)))"
            " / 2) AS BIGINT)"
        ).alias("klo"),
        F.expr(
            f"CAST(ceil(1 + (max(n) + {_MCI_Z}"
            " * sqrt(CAST(max(n) AS DOUBLE))) / 2) AS BIGINT)"
        ).alias("khi"),
    )
    return (
        ranked.join(F.broadcast(k.withColumnRenamed("n", "ntot")), "l_returnflag")
        .groupBy("l_returnflag", F.col("ntot").alias("n"), "klo", "khi")
        .agg(
            F.max(
                F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN cents END")
            ).alias("median_lo_cents"),
            F.max(F.expr("CASE WHEN rn = klo THEN cents END")).alias(
                "ci_lo_cents"
            ),
            F.max(F.expr("CASE WHEN rn = khi THEN cents END")).alias(
                "ci_hi_cents"
            ),
        )
        .select(
            "l_returnflag",
            "n",
            "klo",
            "khi",
            "median_lo_cents",
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )
