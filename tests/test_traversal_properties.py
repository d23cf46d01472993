"""Property tests (SURVEY.md §5): random graphs inside the reference's
envelope (n ≤ 30, undirected, self-loops allowed — Assignment 2.pdf
p.2) checked against a pure-Python model of the pinned semantics:
- bfs_levels = min-hop levels (R5 determinism rule, SURVEY.md §7.3)
- dfs_leaves = childless vertices of the min-vid-parent BFS tree
- reachable ⊇ dfs_leaves; level-0 is exactly the start
- vertex_degree = adjacency-row sum with loops counted once
"""

from __future__ import annotations

from collections import deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _edge_lists(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    pairs = st.tuples(
        st.integers(min_value=1, max_value=n), st.integers(min_value=1, max_value=n)
    )
    raw = draw(st.lists(pairs, max_size=24))
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
    start = draw(st.integers(min_value=1, max_value=n))
    return n, edges, start


graph_case = st.composite(_edge_lists)()


def _model_bfs(edges, start):
    """Min-hop levels by textbook queue BFS over the symmetrized
    adjacency (loops once, like symmetrize())."""
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    levels = {start: 0}
    q = deque([start])
    while q:
        v = q.popleft()
        for w in sorted(adj.get(v, ())):
            if w not in levels:
                levels[w] = levels[v] + 1
                q.append(w)
    return levels


def _model_leaves(edges, start):
    levels = _model_bfs(edges, start)
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    parents = set()
    for v, lv in levels.items():
        if v == start:
            continue
        cands = [u for u in adj.get(v, ()) if levels.get(u) == lv - 1]
        parents.add(min(cands))
    return set(levels) - parents


def _spark_edges(spark, edges):
    from distributed_graph_database_spark.graph.derive import symmetrize

    if not edges:
        return spark.createDataFrame([], "src bigint, dst bigint")
    return symmetrize(spark.createDataFrame(edges, "src bigint, dst bigint"))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=graph_case)
def test_bfs_levels_match_model(spark, case):
    from distributed_graph_database_spark.graph import traversal

    n, edges, start = case
    got = {
        r.vid: r.level
        for r in traversal.bfs_levels(
            spark, _spark_edges(spark, edges), start, cache_edges=False
        ).collect()
    }
    assert got == _model_bfs(edges, start)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=graph_case)
def test_dfs_leaves_match_model(spark, case):
    from distributed_graph_database_spark.graph import traversal

    n, edges, start = case
    got = {
        r.vid
        for r in traversal.dfs_leaves(
            spark, _spark_edges(spark, edges), start, cache_edges=False
        ).collect()
    }
    want = _model_leaves(edges, start)
    assert got == want
    # leaves ⊆ reachable, and the start is level 0 exactly once
    assert got <= set(_model_bfs(edges, start))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=graph_case)
def test_vertex_degree_matches_row_sum(spark, case):
    from distributed_graph_database_spark.graph import traversal

    n, edges, start = case
    got = {
        r.vid: r.degree
        for r in traversal.vertex_degree(_spark_edges(spark, edges)).collect()
    }
    want: dict[int, int] = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        if a != b:
            want[b] = want.get(b, 0) + 1
    assert got == want
