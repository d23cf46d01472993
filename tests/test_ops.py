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
}

GOLDEN_REASONS = {6: "bad_op", 7: "exists", 8: "missing"}


def test_route_requests_golden(spark, sf_oracle):
    got = {r.seq: r.server for r in ops.route_requests(spark, sf_oracle).collect()}
    assert got == GOLDEN_ROUTES


def test_validate_requests_golden(spark, sf_oracle):
    rows = ops.validate_requests(spark, sf_oracle).collect()
    rejected = {r.seq: r.reason for r in rows if r.status == "rejected"}
    assert rejected == GOLDEN_REASONS
    assert {r.seq for r in rows if r.status == "valid"} == {1, 2, 3, 4, 5}


def test_ops_log_replay_golden(spark, sf_oracle):
    rows = ops.ops_log_replay(spark, sf_oracle).collect()
    assert len(rows) == 1
    state = rows[0]
    # G7's final state is the seq-4 modify (last-write-wins over seq 1).
    assert (state.graph_id, state.last_seq, state.last_op, state.n_writes) == (
        "G7", 4, 2, 2,
    )
