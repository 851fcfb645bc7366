"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``metas_judiciarias_etl_spark``; this module
re-exports the query registry (one entry per operator family from
SURVEY.md §2 plus the training-data-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metas_judiciarias_etl_spark import registry  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's central operator shape — a filtered,
    grouped multi-column hash aggregation (SURVEY.md §2.4 A1/A4), expressed
    as TPC-H Q1 on the fixture lineitem table.
    """
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted ⇒ rows-only)."""
    registry.load_all()
    return dict(registry.ORACLES)
