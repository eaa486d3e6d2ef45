"""Connected-components operator: chains, cycles, transitivity, and a
property-based sweep against a union-find reference."""

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.operators.graph import connected_components


def _union_find(edges):
    """Driver-side reference: path-compressed union-find, min root."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _cc(spark, rows):
    pairs = spark.createDataFrame(rows, "doc_a BIGINT, doc_b BIGINT")
    got = connected_components(pairs).collect()
    return {r.doc_id: r.cluster_id for r in got}


def test_transitive_chain(spark):
    # 1-2, 2-3, 3-4: one component even though 1,4 never pair
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cycle_and_islands(spark):
    got = _cc(spark, [(10, 20), (20, 30), (30, 10), (7, 8)])
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_min_label_is_component_min(spark):
    # edge order / direction must not matter
    got = _cc(spark, [(9, 5), (5, 12), (3, 12)])
    assert got == {3: 3, 5: 3, 9: 3, 12: 3}


def test_long_chain_converges(spark):
    n = 12
    rows = [(i, i + 1) for i in range(n)]
    got = _cc(spark, rows)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.slow
def test_cc_matches_union_find(spark, edges):
    """Random edge sets (self-loops excluded, duplicates and both
    orientations allowed): min-label propagation must agree with
    driver-side union-find on every node's component minimum."""
    assert _cc(spark, [(int(a), int(b)) for a, b in edges]) == _union_find(edges)


# ------------------------------------------------------------- triangles
def _brute_triangles(edges):
    """Driver-side reference: per-node triangle counts by enumerating
    all vertex triples over the adjacency set."""
    from itertools import combinations

    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.slow
def test_triangle_counts_match_bruteforce(spark, raw):
    from core_spark.operators.graph import triangle_counts

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw if u != v})
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {
        r["doc_id"]: r["n_tri"] for r in triangle_counts(pairs).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_counts_clique_and_chain(spark):
    """K4 gives every corner C(3,2)=3 triangles; a chain gives none."""
    from core_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(10, 11), (11, 12), (12, 13)]
    pairs = spark.createDataFrame(k4 + chain, "doc_a BIGINT, doc_b BIGINT")
    got = {r["doc_id"]: r["n_tri"] for r in triangle_counts(pairs).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
