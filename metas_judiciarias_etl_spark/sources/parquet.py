"""Parquet source for the driver fixture tables (TESTDATA.md).

Plain ``spark.read.parquet`` — predicate pushdown, column pruning and
partition pruning are Catalyst's job; nothing custom needed. At 100 TB these
reads are expected to hit a partitioned/ bucketed lakehouse layout; the API
here stays the same.

Small-input fan-out (round 7): the fixture files are single-row-group
parquet, so Spark's byte-range splitting cannot parallelize the scan — every
row lands in ONE task and all pre-shuffle map work (tokenize/shingle/hash/
partial aggregation) runs on one core of ``local[N]`` (guide §2.5 "input
skew: one huge unsplittable file"). ``load_table`` therefore fans small scans
out with a round-robin repartition sized from the FILE size: when the file
would already yield >= the session's parallelism in 128 MB splits the
repartition is skipped entirely, so at production scale this is a no-op and
no 100 TB table is ever re-shuffled. Filters and column pruning still reach
the parquet scan — Catalyst pushes both through Repartition — verified by
tests/test_physical_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _scan_fanout(spark: SparkSession, path: str) -> int:
    """Target partition count for a small-file scan, or 0 for "leave the
    scan's own splits alone".

    Scale-adaptive (guide §2): derived from the input size, not a constant.
    A file that already yields >= defaultParallelism scan splits at
    ``spark.sql.files.maxPartitionBytes`` parallelizes by itself — return 0
    and add no exchange (the production / 100 TB path). Only when the scan
    would otherwise run on fewer cores than the session has (here: tiny
    single-row-group fixtures) do we fan out to the session's parallelism.
    Non-local paths (no stat-able size) return 0: never reshuffle a table we
    cannot prove small. ``SPARK_GRAFT_SCAN_FANOUT=0`` disables the fan-out
    (A/B instrumentation; production clusters can also set it)."""
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "1") == "0":
        return 0
    try:
        size = os.path.getsize(path)
    except OSError:
        return 0
    max_split = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    cores = spark.sparkContext.defaultParallelism
    est_splits = (size + max_split - 1) // max_split
    if est_splits >= cores:
        return 0
    return cores


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Downstream window/join logic works on integer nanoseconds
        # (timezone-proof, exact). The fixture's physical type has varied
        # across driver generations — TIMESTAMP(NANOS) (rejected by the
        # vectorized reader; surfaces as int64 under nanosAsLong) or
        # TIMESTAMP(MICROS) (surfaces as timestamp / timestamp_ntz) — so
        # normalize every variant to int64 epoch-nanos here, in one place.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        fan = _scan_fanout(spark, f"{sf_dir}/{name}.parquet")
        if fan:
            df = df.repartition(fan)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df  # already int64 nanos
        if isinstance(ts_type, T.TimestampNTZType):
            # timestampdiff over two NTZ operands never consults the session
            # timezone — naive value interpreted as-is, matching DuckDB's
            # epoch_us() over a naive timestamp.
            micros = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        else:  # TimestampType: parquet stores UTC micros; unix_micros is exact
            micros = F.unix_micros(F.col("ts"))
        return df.withColumn("ts", (micros * F.lit(1000)).cast("long"))
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    fan = _scan_fanout(spark, f"{sf_dir}/{name}.parquet")
    if fan:
        df = df.repartition(fan)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register temp views under their names."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
