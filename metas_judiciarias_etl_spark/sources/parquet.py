"""Parquet source for the driver fixture tables (TESTDATA.md).

Plain ``spark.read.parquet`` — predicate pushdown, column pruning and
partition pruning are Catalyst's job; nothing custom needed. At 100 TB these
reads are expected to hit a partitioned/ bucketed lakehouse layout; the API
here stays the same.
"""

from __future__ import annotations

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register temp views under their names."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
