"""Drive every registered query against its DuckDB oracle at the small SF —
a local mirror of the driver's CORRECTNESS gate.

Marked ``slowparity`` (the full 384-query sweep is the suite's largest
cost): ``pytest -m "not slowparity"`` is the <15-minute dev gate; this
sweep still runs in the default/driver invocation and in
``scripts/record_parity.py`` each round."""

from __future__ import annotations

import pytest

from metas_judiciarias_etl_spark import registry
from tests.oracle_harness import compare, duckdb_con

registry.load_all()

pytestmark = pytest.mark.slowparity


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_con(sf_oracle)
    yield c
    c.close()


_CLEAR_EVERY = 8
_clear_counter = {"n": 0}


@pytest.fixture(scope="module", autouse=True)
def _clean_cache_after_module(spark):
    """Later modules (physical-plan assertions) must not see this module's
    leftover pins as InMemoryRelation nodes."""
    yield
    spark.catalog.clearCache()


@pytest.fixture(autouse=True)
def _clear_spark_cache(spark):
    """Query builders persist() intermediates as a side effect (81 sites);
    across a 366-query sweep those caches accumulate unreleased (ADVICE
    r4). Round 8: drop them every _CLEAR_EVERY queries instead of every
    query — the bound on accumulated cache (8 queries' pins at sf0.01,
    a few MB) still keeps memory pressure from ever shaping a parity
    verdict, while the alphabetically-adjacent dedup_*/sim_* families
    stop rebuilding the same shared memo chain (shingles → signatures →
    truth pairs) once per test. Parity itself is cache-independent —
    results are what is compared, and layout invariance is certified
    separately by test_partitioning_invariance."""
    yield
    _clear_counter["n"] += 1
    if _clear_counter["n"] % _CLEAR_EVERY == 0:
        spark.catalog.clearCache()


def all_query_names():
    registry.load_all()
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("name", all_query_names())
def test_query_parity(name, spark, sf_oracle, con):
    fn = registry.QUERIES[name]
    df = fn(spark, sf_oracle)
    if name not in registry.ORACLES:
        # rows-only check (non-SQL-expressible op): must run and be stable.
        n = df.count()
        assert n >= 0
        return
    problems = compare(name, df, registry.ORACLES[name], con)
    assert not problems, "\n".join(problems)


def test_every_oracle_has_query():
    for name in registry.ORACLES:
        assert name in registry.QUERIES


@pytest.mark.parametrize("name", all_query_names())
def test_query_output_is_driver_hashable(name, spark, sf_oracle):
    """The driver's canonicalizer pandas-sorts result columns; array/map/
    struct cells are unhashable there and kill the row (CORRECTNESS_r01:
    percentile_agg, array_agg_sorted). Every registered query must therefore
    project only atomic columns — serialize or scalarize anything nested."""
    from pyspark.sql import types as T

    fn = registry.QUERIES[name]
    schema = fn(spark, sf_oracle).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: complex-typed output columns {bad} break the driver compare"


def test_harness_detects_value_and_count_divergence(spark, sf_oracle, con):
    """Meta-test of the gate itself: compare() must FAIL when the oracle
    is wrong — a value off by one, a missing row, and a renamed column
    all have to produce problems. A silently-lenient harness would make
    every green row above meaningless."""
    name = "q6_forecast_revenue"
    df = registry.QUERIES[name](spark, sf_oracle)
    good = registry.ORACLES[name]
    assert not compare(name, df, good, con)
    # value perturbation
    assert compare(name, df, f"SELECT revenue + 1 AS revenue FROM ({good})", con)
    # row-count perturbation
    assert compare(name, df, f"SELECT * FROM ({good}) WHERE 1 = 0", con)
    # column-name perturbation (driver sorts by name before hashing)
    assert compare(name, df, f"SELECT revenue AS rev FROM ({good})", con)
