"""Query registry: the single source of truth for the driver contract.

Every operator family from SURVEY.md §2 (and the scale extensions) registers
here a pair of:

* a PySpark callable ``(spark, sf_dir) -> DataFrame``
* an equivalent ANSI-SQL string for the DuckDB oracle (or ``None`` for
  genuinely non-SQL-expressible ops, which get a weaker rows-only check).

``__spark_entry__.py`` re-exports these. Column names are aliased identically
on both sides — the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_oracle(name: str, sql: str) -> None:
    ORACLES[name] = sql


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .plans import analytics_ext, evaluation_ext, functions_ext, joins_ext, profiling_ext, pruning_ext, relational, retrieval_ext, scalars, scale_ext, sessions_ext, timeseries_ext, tpch_ext  # noqa: F401
    from .plans import windows as window_plans  # noqa: F401
    from .operators import decontam, dedup, multimodal, prep, similarity, textstats  # noqa: F401
    from .streaming import batch_windows  # noqa: F401
    from .metas import queries as metas_queries  # noqa: F401
