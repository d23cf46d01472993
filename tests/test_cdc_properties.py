"""Property test: the max(struct) CDC compaction equals a sequential
dict replay on random changelogs — out-of-order delivery, repeated
updates, delete-then-nothing, resurrect-after-delete (a later I wins
over an earlier D), keys the log never inserts."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_graph_database_spark.sources.formats import cdc_compact_frame


@st.composite
def _logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for seq in range(1, n + 1):  # globally unique seq = the transport order
        key = draw(st.integers(min_value=1, max_value=6))
        op = draw(st.sampled_from(["I", "U", "D"]))
        status = draw(st.sampled_from(["O", "F", "P"]))
        cents = None if op == "D" else draw(st.integers(0, 10_000))
        rows.append((key, status, seq, op, cents))
    # deliver out of order: compaction must not depend on arrival order
    shuffled = list(rows)
    random.Random(draw(st.integers(0, 999))).shuffle(shuffled)
    return rows, shuffled


def _model(rows):
    state = {}
    for key, status, seq, op, cents in sorted(rows, key=lambda r: r[2]):
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (status, seq, cents)
    return state


@given(_logs())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_cdc_compaction_equals_sequential_replay(spark, case):
    rows, shuffled = case
    log = spark.createDataFrame(
        shuffled,
        "o_orderkey bigint, o_orderstatus string, seq int, op string, cents bigint",
    )
    got = {
        r.o_orderkey: (r.o_orderstatus, r.seq, r.cents)
        for r in cdc_compact_frame(log).collect()
    }
    assert got == _model(rows)
