"""Property test: distributed Borůvka equals sequential Kruskal under
the same strict total order, on random graphs — multi-component
forests, tied weights, isolated chains; the shapes the one fixed
nation graph can't cover. (Equality of the two classic algorithms
under a strict order is exactly the uniqueness theorem the exact
oracle relies on.)"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _kruskal(edges):
    """Sequential model: scan edges by (w DESC, a, b), union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted(((w, a, b) for a, b, w in edges),
                          key=lambda t: (-t[0], t[1], t[2])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def _graphs(draw):
    n_edges = draw(st.integers(min_value=0, max_value=30))
    seen = set()
    out = []
    for _ in range(n_edges):
        a = draw(st.integers(min_value=0, max_value=11))
        b = draw(st.integers(min_value=0, max_value=11))
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        # small weight range => plenty of ties for the (a, b) tiebreak
        out.append((a, b, draw(st.integers(min_value=1, max_value=5))))
    return out


graph_case = st.composite(_graphs)()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=graph_case)
def test_boruvka_matches_kruskal(spark, case):
    from distributed_graph_database_spark.graph.analytics import (
        minimum_spanning_forest,
    )

    edges = spark.createDataFrame(
        case or [(0, 1, 1)], "a bigint, b bigint, w_cents bigint"
    )
    if not case:
        edges = edges.limit(0)
    got = sorted(
        (r.a, r.b, r.w_cents) for r in minimum_spanning_forest(spark, edges).collect()
    )
    assert got == _kruskal(case)


def test_mst_on_nation_graph_is_a_spanning_tree(spark, sf_oracle):
    """The declared key's output: |V|-1 edges, all nations touched
    (the trade graph is connected at every SF), acyclic by count."""
    from distributed_graph_database_spark.graph.analytics import (
        _trade_edges,
        graph_mst,
    )

    mst = graph_mst(spark, sf_oracle).collect()
    verts = set()
    for r in mst:
        verts.add(r.a)
        verts.add(r.b)
    all_verts = set()
    for r in _trade_edges(spark, sf_oracle).collect():
        all_verts.add(r.a)
        all_verts.add(r.b)
    assert verts == all_verts
    assert len(mst) == len(all_verts) - 1
