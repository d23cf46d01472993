"""Matrix source/sink: parity with the reference's own G*.txt fixtures
(R1 parse, secondary_server.c:119-153), add/modify store semantics
(R2/R3, primary_server.c:111-152), and degenerate graphs."""

from __future__ import annotations

import os

import pytest

from distributed_graph_database_spark import fixtures
from distributed_graph_database_spark.sources import matrix


def test_parse_reference_fixture_files(spark):
    """Ingesting the reference's actual G1-G6 matrix files must yield
    exactly the FIXTURES.md edge lists (read-only access)."""
    edges = matrix.parse_matrix_dir(spark, "/root/reference").collect()
    got: dict[str, set] = {}
    for r in edges:
        got.setdefault(r.graph_id, set()).add((r.src, r.dst))
    want = {g: set(e) for g, (_, e) in fixtures.FIXTURE_GRAPHS.items()
            if e and g in fixtures.REFERENCE_GRAPH_IDS}
    assert got == want


def test_parse_vertices_counts_isolated_and_empty(spark):
    vids = matrix.parse_matrix_vertices(spark, "/root/reference").collect()
    per_graph: dict[str, set] = {}
    for r in vids:
        per_graph.setdefault(r.graph_id, set()).add(r.vid)
    # G6: two isolated vertices exist despite zero edges.
    assert per_graph["G6"] == {1, 2}
    # G4: n=0 → no vertices at all.
    assert "G4" not in per_graph
    assert per_graph["G5"] == {1, 2, 3, 4, 5}


def test_matrix_text_roundtrip_is_identity(spark, tmp_path):
    out = str(tmp_path / "mx")
    matrix.write_fixture_matrix_files(out)
    parsed = matrix.parse_matrix_dir(spark, out).collect()
    got: dict[str, set] = {}
    for r in parsed:
        got.setdefault(r.graph_id, set()).add((r.src, r.dst))
    want = {g: set(e) for g, (_, e) in fixtures.FIXTURE_GRAPHS.items() if e}
    assert got == want


def test_matrix_files_byte_identical_to_reference():
    """Our serializer writes the reference's exact file format."""
    for gid in fixtures.REFERENCE_GRAPH_IDS:
        n, edges = fixtures.FIXTURE_GRAPHS[gid]
        with open(f"/root/reference/{gid}.txt") as f:
            ref = f.read()
        ours = matrix.matrix_text(n, edges)
        assert ours.strip() == ref.strip(), gid


def test_add_refuses_existing_graph(spark, tmp_path):
    """R2 'add' gate (client.c:43-44): writing mode=errorifexists to an
    existing path raises — the op-1 must-not-exist contract."""
    path = str(tmp_path / "g")
    df = fixtures.fixture_edges_df(spark).filter("graph_id = 'G2'")
    df.write.mode("errorifexists").parquet(path)
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        df.write.mode("errorifexists").parquet(path)


def test_modify_overwrites_single_partition(spark, sf_oracle):
    """R3: the dynamic partition overwrite replaces only G1; all other
    graphs keep their original edge counts."""
    rows = {r.graph_id: r.n_edges for r in
            matrix.graph_store_roundtrip(spark, sf_oracle).collect()}
    assert rows[matrix.MODIFY_GRAPH_ID] == len(matrix.MODIFIED_EDGES)
    assert rows["G5"] == 4 and rows["G2"] == 1 and rows["G3"] == 2
    # store layout really is one directory per graph partition
    parts = {p for p in os.listdir(matrix.STORE_DIR) if p.startswith("graph_id=")}
    assert "graph_id=G1" in parts and "graph_id=G5" in parts


def test_distributed_export_matches_reference_serializer(spark, sf_smoke):
    """graph_export_matrix (the Spark-side R2 serialize) produces the
    exact lines of the driver-side reference-format serializer."""
    got: dict[str, dict[int, str]] = {}
    for r in matrix.graph_export_matrix(spark, sf_smoke).collect():
        got.setdefault(r.graph_id, {})[r.line_no] = r.line
    for gid, (n, edges) in fixtures.FIXTURE_GRAPHS.items():
        expect = matrix.matrix_text(n, edges).strip("\n").split("\n")
        lines = [got[gid][i] for i in range(len(got[gid]))]
        assert lines == expect, (gid, lines, expect)
