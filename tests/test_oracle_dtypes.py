"""Static type audit of every registered oracle vs its Spark query.

The driver's value-hash goes through pandas, where DuckDB HUGEINT (any
``sum()`` over integers) renders as float64 while Spark emits bigint —
identical values, divergent hashes (CORRECTNESS_r02: ``dq_lineitem_rules``,
``pareto_topshare``, ``table_snapshot_diff``; latent in ``anomaly_zscore``,
``pack_sequences``). The value-level parity sweep compares via ``fetchall()``
(HUGEINT → Python int) and is structurally blind to the class; this test
reads the STATIC types of both plans — no execution — and fails on any
hugeint / int-vs-float / decimal-vs-double divergence before the driver can.
"""

from __future__ import annotations

import pytest

from metas_judiciarias_etl_spark import registry
from tests.oracle_harness import dtype_problems, duckdb_con

registry.load_all()


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_con(sf_small)
    yield c
    c.close()


def oracle_names():
    registry.load_all()
    return sorted(registry.ORACLES)


@pytest.mark.parametrize("name", oracle_names())
def test_oracle_dtype_parity(name, spark, sf_small, con):
    schema = registry.QUERIES[name](spark, sf_small).schema
    problems = dtype_problems(name, schema, registry.ORACLES[name], con)
    assert not problems, "\n".join(problems)
