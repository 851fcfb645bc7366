"""Table-layout helpers: partitioned parquet, bucketed tables, ORC.

At 100 TB the scan layout IS the query plan: a filter on an unpartitioned
column reads everything; the same filter on a partition column reads one
directory. These helpers encode the three layout moves the engine's plans
assume upstream tables can make, and tests/test_storage_layout.py asserts
the resulting physical plans (partition pruning reaching the scan; a
bucketed fact-fact join running with ZERO exchanges).

* ``write_partitioned`` — hive-style directory partitioning. Partition by
  low-cardinality filter columns (event_type, date, source); Catalyst
  turns matching predicates into PartitionFilters so pruned directories
  are never listed, let alone read.
* ``write_bucketed`` — pre-shuffle the table ONCE at write time into N
  hash buckets on the join/agg key. Two tables bucketed the same way
  join bucket-to-bucket with no exchange at read time — the amortized
  answer to the biggest repeated shuffle in a warehouse (fact⋈fact).
  Requires a metastore table (saveAsTable), not a bare path.
* ``write_orc`` / ``read_orc`` — second columnar container (built into
  Spark) for interop; same pushdown/pruning machinery as parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``.

    Partition columns should be low-cardinality: every distinct tuple is a
    directory, and a high-cardinality partition key (user_id!) creates
    millions of tiny files — the small-files problem instead of pruning."""
    df.write.format(fmt).partitionBy(*partition_cols).mode("overwrite").save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) metastore table.

    ``n_buckets`` is the layout's parallelism contract — pick it from the
    target cluster (~2-4x executors) and keep it IDENTICAL across tables
    that join, or the bucket-to-bucket alignment (and the shuffle
    elimination) is lost. ``sort_col`` additionally pre-sorts within each
    bucket so a sort-merge join skips its Sort as well."""
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.format("orc").mode("overwrite").save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("orc").load(path)
