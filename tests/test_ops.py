"""Golden tests for the ops/consistency layer against the FIXTURES.md
routing/replay table (reference semantics: load_balancer.c:78-99,
client.c:36-49, primary_server.c:62-107). Oracle parity is covered by
test_oracle_parity.py; these pin the absolute expected values."""

from __future__ import annotations

from distributed_graph_database_spark import ops

GOLDEN_ROUTES = {
    1: "primary",
    2: "secondary_2",
    3: "secondary_1",
    4: "primary",
    5: "secondary_1",
    6: "rejected",
    7: "rejected",
    8: "rejected",
    9: "primary",
    10: "secondary_2",
    11: "primary",
    12: "rejected",
}

GOLDEN_REASONS = {6: "bad_op", 7: "exists", 8: "missing", 12: "missing"}


def test_route_requests_golden(spark, sf_oracle):
    got = {r.seq: r.server for r in ops.route_requests(spark, sf_oracle).collect()}
    assert got == GOLDEN_ROUTES


def test_validate_requests_golden(spark, sf_oracle):
    rows = ops.validate_requests(spark, sf_oracle).collect()
    rejected = {r.seq: r.reason for r in rows if r.status == "rejected"}
    assert rejected == GOLDEN_REASONS
    assert {r.seq for r in rows if r.status == "valid"} == {
        1, 2, 3, 4, 5, 9, 10, 11,
    }


def test_ops_log_replay_golden(spark, sf_oracle):
    rows = ops.ops_log_replay(spark, sf_oracle).collect()
    state = {
        r.graph_id: (r.last_seq, r.last_op, r.n_writes) for r in rows
    }
    # Last-write-wins: G7's final state is the seq-11 modify (over
    # seqs 1 and 4); G1 gets its single seq-9 modify.
    assert state == {"G7": (11, 2, 3), "G1": (9, 2, 1)}


def test_ops_graph_snapshot_golden(spark, sf_oracle):
    """FIXTURES.md snapshot golden: G1 = fixture state then the seq-9
    payload; G7 = seqs 1, 4, 11 — versions dense-ranked by seq."""
    from distributed_graph_database_spark import fixtures

    rows = ops.graph_ops_snapshot(spark, sf_oracle).collect()
    got = {}
    for r in rows:
        got.setdefault((r.graph_id, r.version, r.seq), set()).add((r.src, r.dst))
    fixture_g1 = set(
        (s, d) for g, s, d in fixtures.fixture_edges_rows() if g == "G1"
    )
    pay = {s: set(e) for s, (_, e) in fixtures.WRITE_PAYLOADS.items()}
    assert got == {
        ("G1", 1, 0): fixture_g1,
        ("G1", 2, 9): pay[9],
        ("G7", 1, 1): pay[1],
        ("G7", 2, 4): pay[4],
        ("G7", 3, 11): pay[11],
    }


def test_ops_graph_snapshot_version_as_of_prunes(spark, sf_oracle):
    """The VERSION-AS-OF claim must be real: a single-version read
    plans partition filters on (graph_id, version) and touches no
    other snapshot."""
    from pyspark.sql import functions as F

    ops.graph_ops_snapshot(spark, sf_oracle)  # stage the store
    d = ops._snapshot_dir(spark, sf_oracle)
    one = spark.read.parquet(d).filter(
        (F.col("graph_id") == "G7") & (F.col("version") == 2)
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "graph_id" in plan
    assert {(r.src, r.dst) for r in one.select("src", "dst").collect()} == {
        (1, 2), (1, 3), (3, 4),
    }
