"""Structured Streaming operators (SURVEY.md §2.8 planned extension).

Real ``readStream`` pipelines over event data: tumbling / sliding /
session windows with watermark-based late-data handling, plus a custom
stateful operator via ``applyInPandasWithState``. The batch-checkable
equivalents (same frame math, DuckDB oracles) live in
``streaming/batch_windows.py``; these are the streaming forms, exercised in
tests with the file source + ``trigger(availableNow=True)`` + memory sink.

Scale notes:
* windowed aggregations keep state per (window, key) in the state store —
  the watermark bounds state size; without it a 100 TB stream grows state
  forever;
* ``session_window`` merges adjacent state on arrival, partitioned by the
  grouping key (user_id — high cardinality, spreads evenly);
* file-source streaming at scale lists directories incrementally
  (``maxFilesPerTrigger`` bounds batch size; a real deployment fronts this
  with Kafka or a log-structured table format).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream with an explicit schema (streaming reads
    must not infer schemas — that's a full scan per start)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format("json").load(path)


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-(window, event_type) counts/sums with late-data eviction: rows
    later than the watermark are dropped and their window state finalized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def tumbling_keyed_counts(events: DataFrame, key: str = "user_id",
                          width: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Per-(window, key) counts/sums for a HIGH-CARDINALITY key: the state
    store holds one row per live (window, key) pair, so key cardinality —
    not event rate — sizes the store. The batch twin
    ``stream_state_keys_profile`` measures exactly that cardinality; at
    100 TB run this with the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the default
    HDFSBacked provider keeps every state row on-heap and OOMs at
    tens of millions of live keys per executor, while RocksDB spills to
    native memory + local disk with changelog checkpointing."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Data-driven session windows per user: a session closes when no event
    arrives within ``gap``; state merges are handled by the engine."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dynamic_session_counts(events: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Session windows whose inactivity gap is a PER-EVENT expression —
    a view holds the session open 60 minutes, anything else 15: the
    engagement-aware rule fixed-gap sessions can't express. Exactly the
    streaming form of the registered batch query dynamic_gap_sessions
    (same merge semantics: [ts, ts+gap) windows, adjacency merges);
    session state per user remains one open window regardless of rate."""
    gap = F.expr(
        "CASE WHEN event_type = 'view' THEN '60 minutes'"
        " ELSE '15 minutes' END"
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: running per-user totals via
# applyInPandasWithState (the arbitrary-state API — the escape hatch for
# semantics window()/session_window() can't express).
# ---------------------------------------------------------------------------
_STATE_SCHEMA = T.StructType(
    [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
)
_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].fillna(0.0).sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [user_id], "running_total": [round(total, 2)], "n_events": [n]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Unbounded running (total, count) per user — arbitrary keyed state,
    one state row per user, updated per micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_interval_join(
    events: DataFrame, lookback: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: each click matched to the same user's
    purchases within ``lookback`` before it.

    Both sides carry a watermark AND the join condition bounds event time —
    the two requirements that let Spark evict join state (without them,
    stream-stream join state grows without bound; with them, state per side
    is bounded by watermark + lookback). The time bound also makes results
    deterministic under availableNow replay."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts <= c_ts AND p_ts >= c_ts - INTERVAL {lookback}"
        ),
    ).select("click_id", "purchase_id", F.col("c_user").alias("user_id"), "p_value")


def click_purchase_left_join(
    events: DataFrame, lookback: str = "30 minutes", watermark: str = "0 seconds"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits — matched
    rows immediately, UNMATCHED clicks as null-padded rows only after the
    watermark proves no qualifying purchase can still arrive (p_ts <= c_ts
    bounds the wait to the click's own event time). This is the funnel
    question the inner join cannot answer: which clicks NEVER converted.
    The null-row delay is the price of correctness — emitting earlier
    could be contradicted by a late purchase inside the watermark."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts <= c_ts AND p_ts >= c_ts - INTERVAL {lookback}"
        ),
        "leftOuter",
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        "p_value",
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str):
    """Drain all available input into an in-memory table (test/debug sink).
    Returns the (terminated) query so callers can read recentProgress —
    watermark drop counts, state rows, per-batch metrics."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def dedup_within_watermark(
    events: DataFrame, delay: str = "30 minutes", keys: Iterable[str] = ("event_id",)
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes its event time, then evicts — the streaming form of
    ``dedup_exact`` (operators/dedup.py). Plain ``dropDuplicates`` on a
    stream would hold every key forever; at-least-once sources (Kafka,
    file redelivery) + this operator = effective exactly-once delivery
    downstream."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def ohlc_bars_stream(events: DataFrame, width: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Streaming OHLC: the batch ``ohlc_bars`` shape under incremental
    state — open/close via struct min/max (mergeable, so each micro-batch
    folds into window state), high/low/count as plain partials. Watermark
    bounds state exactly as for tumbling counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value"))["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


def static_enrich_counts(
    events: DataFrame,
    dim: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join: enrich the event stream with a slowly-changing
    dimension (user -> segment), then window-aggregate per segment.

    The static side is broadcast — a stream-static join keeps NO join
    state (each micro-batch probes the broadcast table), which is why it
    is the right shape for dimension enrichment at any stream rate; only
    the windowed aggregation holds state, bounded by the watermark. The
    dim is re-read per micro-batch, so a slowly-changing dimension picks
    up updates without restarting the query."""
    enriched = events.withWatermark("ts", watermark).join(
        F.broadcast(dim), events["user_id"] == dim["dim_user_id"]
    )
    return (
        enriched.groupBy(F.window("ts", width).alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state successor to
# applyInPandasWithState): the same running per-user totals implemented on
# the new StatefulProcessor API — typed named state handles, TTL support,
# timers — which is the API new 100 TB stateful pipelines should target.
# ---------------------------------------------------------------------------
def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Running (total, count) per user via ``transformWithStateInPandas``:
    one named ValueState row per user, updated per micro-batch. Unlike
    applyInPandasWithState, state here is a typed named handle on a
    processor object (getValueState/getListState/getMapState with
    optional TTL), the shape that composes with RocksDB state stores and
    state-v2 checkpoints at scale."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "total double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            total, n = self._agg.get() if self._agg.exists() else (0.0, 0)
            for pdf in rows:
                total += float(pdf["value"].fillna(0.0).sum())
                n += int(len(pdf))
            self._agg.update((total, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "running_total": [round(total, 2)],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType=_RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
