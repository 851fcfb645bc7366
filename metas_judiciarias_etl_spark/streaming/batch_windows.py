"""Event-time windowing (SURVEY §2.8 planned extension) — batch-checkable
forms with DuckDB oracles.

``events.ts`` is read as int64 *nanoseconds* (see sources/parquet.py), so
every window boundary is pure integer arithmetic — identical in any session
timezone and trivially verifiable in SQL. The streaming variants (true
``window()``/``session_window()``/``withWatermark`` over readStream) live in
``streaming/windows.py``; these batch forms compute the same frames.

Scale note: tumbling/sliding aggregation is one hash-agg shuffle on
(bucket, key); session windows need a per-user sort — expressed as a window
function so Spark partitions by user_id (high cardinality → even spread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import floor_bucket_s, floor_epoch_s
from ..registry import query
from ..sources.parquet import load_table

_NS = 1_000_000_000


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS window_start_s,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type (batch form of
    ``groupBy(window(ts, '1 hour'), ...)``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("window_start_s", floor_bucket_s("ts", 3600))
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH base AS (
        SELECT CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS b, value
        FROM events
    ), expanded AS (
        SELECT unnest([b, b - 1800]) AS window_start_s, value FROM base
    )
    SELECT window_start_s, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min: each event lands in exactly two
    windows (batch form of ``window(ts, '1 hour', '30 minutes')``)."""
    ev = load_table(spark, sf_dir, "events")
    b = floor_bucket_s("ts", 1800)
    return (
        ev.withColumn("window_start_s", F.explode(F.array(b, b - 1800)))
        .groupBy("window_start_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 600 OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, epoch(ts))
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(floor(min(epoch(ts))) AS BIGINT) AS session_start_s,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user (batch gaps-and-islands form of
    ``session_window(ts, '10 minutes')``). Sessionization partitions by
    user_id — high cardinality, so it spreads evenly at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ns = 600 * _NS
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > gap_ns),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # floor-second of min ts == min of per-row floor-seconds (monotone), so
    # the integer bucket math runs per-row and MIN aggregates the result.
    sessions = sessions.withColumn("__ts_s", floor_epoch_s("ts"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("__ts_s").alias("session_start_s"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "stream_dedup_earliest",
    oracle=f"""
    SELECT user_id, event_type,
           CAST((min(struct_pack(t := epoch_ns(ts), e := event_id))).e AS BIGINT)
               AS kept_event_id,
           CAST(min(epoch_ns(ts)) // {_NS} AS BIGINT) AS first_seen_s,
           count(*) - 1 AS n_suppressed
    FROM events
    GROUP BY user_id, event_type
    """,
)
def stream_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming dedup (``dropDuplicatesWithinWatermark`` on
    (user_id, event_type)): keep the earliest event per key, count the
    suppressed replays. The struct-min picks (ts, event_id) — a unique,
    deterministic keeper, the same rule the streaming state store applies
    as events arrive in order.

    At scale this is ONE partial-aggregatable shuffle on the dedup key; in
    true streaming the identical keeper rule runs incrementally with state
    expiry at the watermark (no unbounded state)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id"))["event_id"]
        .cast("long")
        .alias("kept_event_id"),
        F.expr(f"min(ts) div {_NS}").alias("first_seen_s"),
        (F.count(F.lit(1)) - 1).alias("n_suppressed"),
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT (CAST(floor(epoch(e.ts) / 3600) AS BIGINT) * 3600)
               AS window_start_s,
           c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id + 1
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/windows.py::static_enrich_counts — the
    stream-static dimension-enrichment shape: events joined to a broadcast
    user->segment dimension (customer keyed by user_id + 1), then
    aggregated per (hour, segment). The dim broadcast means the join holds
    no shuffle state at any stream rate; sums are exact integer cents.
    The true-stream form (readStream + broadcast join + watermark window)
    is exercised in tests/test_streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("dim_user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        ev.join(F.broadcast(cust), ev["user_id"] == cust["dim_user_id"])
        .withColumn("window_start_s", floor_bucket_s("ts", 3600))
        .groupBy("window_start_s", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("sum_cents"),
        )
    )

@query(
    "stream_state_keys_profile",
    oracle="""
    WITH keyed AS (
        SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
                   AS window_start_s,
               user_id, event_type
        FROM events
    ), per_key AS (
        SELECT window_start_s, user_id, event_type, count(*) AS n
        FROM keyed GROUP BY 1, 2, 3
    )
    SELECT window_start_s,
           count(*) AS n_state_keys,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_key_events
    FROM per_key GROUP BY window_start_s
    """,
)
def stream_state_keys_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store sizing profile for the high-cardinality streaming
    aggregation ``groupBy(window(ts, '1h'), user_id, event_type)``: per
    window, how many DISTINCT state keys the store would hold, how many
    events fold into them, and the largest single key. This is the batch
    twin of the 100 TB streaming question — state rows live between a
    window's first event and watermark expiry, so peak live state is the
    sum of n_state_keys over ceil(1 + delay/width) adjacent windows, and
    this table is what you read before choosing the state-store backend
    (HDFSBacked holds every key on-heap and falls over at tens of
    millions of keys per executor; RocksDB spills to native+disk and is
    the 100 TB default — exercised with provider pinned in
    tests/test_streaming.py::test_rocksdb_state_store_high_cardinality).

    Plan shape: ONE partial-aggregatable shuffle on (window, user_id,
    event_type) — identical to the streaming operator's state key — then
    a window-keyed rollup of the already-tiny per-key table."""
    ev = load_table(spark, sf_dir, "events")
    per_key = (
        ev.withColumn("window_start_s", floor_bucket_s("ts", 3600))
        .groupBy("window_start_s", "user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_key.groupBy("window_start_s").agg(
        F.count(F.lit(1)).alias("n_state_keys"),
        F.sum("n").cast("long").alias("n_events"),
        F.max("n").cast("long").alias("max_key_events"),
    )
