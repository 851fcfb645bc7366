"""Parquet source for the driver fixture tables (TESTDATA.md).

Plain ``spark.read.parquet`` — predicate pushdown, column pruning and
partition pruning are Catalyst's job; nothing custom needed. At 100 TB these
reads are expected to hit a partitioned/ bucketed lakehouse layout; the API
here stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read it as raw int64 nanoseconds instead. All
        # downstream window logic works on integer nanos (timezone-proof).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register temp views under their names."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
