"""SQL-text entry surface: register the fixture tables as views and hand
back ``spark.sql`` — the interface for users who bring SQL, not
DataFrame code. The same Catalyst planner serves both (a SQL string and
its DataFrame twin compile to identical plans), so everything the plan
tests assert — pushdown, broadcast choice, whole-stage codegen — holds
for SQL-text users for free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import load_tables


def open_sql(spark: SparkSession, sf_dir: str) -> Callable[[str], DataFrame]:
    """Register every fixture table (region, nation, customer, supplier,
    part, orders, lineitem, events, documents, embeddings) as a temp view
    over ``sf_dir`` and return a ``sql(text) -> DataFrame`` callable."""
    load_tables(spark, sf_dir)
    return spark.sql
