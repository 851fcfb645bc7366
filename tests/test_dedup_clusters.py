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


def test_nonconvergence_raises_not_wrong_labels(spark):
    # A diameter-9 path with a 2-round budget cannot reach the fixpoint;
    # the operator must fail loudly instead of returning half-propagated
    # (wrong) cluster labels.
    import pytest

    chain = [(i, i + 1) for i in range(1, 10)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        _connected_components(df, max_rounds=2)


# Property: on random graphs the distributed propagation must agree with a
# driver-side union-find (the textbook sequential reference).
try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    import pytest

    def _union_find(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    @pytest.fixture(scope="module")
    def _spark_for_props(spark):
        return spark

    @settings(max_examples=8, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_components_match_union_find(_spark_for_props, pairs):
        norm = [(min(a, b), max(a, b)) for a, b in pairs]
        got = _cc(_spark_for_props, norm)
        assert got == _union_find(norm)


def test_lsh_bucket_cap_guard(spark):
    """Docs sharing a band bucket above the cap generate no pairs from that
    bucket; under the cap, all pairs appear (6 identical docs -> C(6,2))."""
    from metas_judiciarias_etl_spark.operators.dedup import (
        _lsh_candidates,
        _shingle_plan,
        _signatures,
    )

    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated here verbatim") for i in range(6)],
        "doc_id long, text string",
    )
    mh = _signatures(_shingle_plan(docs))
    assert _lsh_candidates(mh).count() == 15
    assert _lsh_candidates(mh, bucket_cap=3).count() == 0


def test_star_chain_and_components(spark):
    from metas_judiciarias_etl_spark.operators.dedup import (
        _connected_components_star,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a_id long, b_id long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in _connected_components_star(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


if HAVE_HYPOTHESIS:

    @settings(max_examples=6, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_star_components_match_union_find(_spark_for_props, pairs):
        from metas_judiciarias_etl_spark.operators.dedup import (
            _connected_components_star,
        )

        norm = [(min(a, b), max(a, b)) for a, b in pairs]
        df = _spark_for_props.createDataFrame(norm, "a_id long, b_id long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in _connected_components_star(df).collect()
        }
        assert got == _union_find(norm)
