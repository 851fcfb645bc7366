"""Connected-components label propagation on hand-built graphs —
pins the iterative operator independent of the LSH pair generator."""

from __future__ import annotations

from metas_judiciarias_etl_spark.operators.dedup import _connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    rows = _connected_components(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4: a diameter-3 chain -> every node labels to 1
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_disjoint(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_cycle_and_bridge(spark):
    # cycle 5-6-7-5 bridged to 2 via 5-2
    got = _cc(spark, [(5, 6), (6, 7), (5, 7), (2, 5)])
    assert got == {2: 2, 5: 2, 6: 2, 7: 2}
