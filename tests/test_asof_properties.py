"""Property test: the merge-scan as-of join equals a brute-force
model on random event sets (random users, duplicate timestamps,
clicks with no prior view — the tie and edge cases the fixed testdata
may never hit)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime.datetime(2024, 1, 1)


def _events(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for eid in range(n):
        user = draw(st.integers(min_value=1, max_value=3))
        # coarse second grid => plenty of exact-tie timestamps
        sec = draw(st.integers(min_value=0, max_value=8))
        kind = draw(st.sampled_from(["click", "view", "error"]))
        rows.append((eid, BASE + datetime.timedelta(seconds=sec), user, kind))
    return rows


events_case = st.composite(_events)()


def _model(rows):
    """Brute force: for each click, the view of the same user with
    ts <= click ts, maximizing (ts, event_id)."""
    out = {}
    for eid, ts, user, kind in rows:
        if kind != "click":
            continue
        cands = [
            (vts, vid)
            for vid, vts, vuser, vkind in rows
            if vkind == "view" and vuser == user and vts <= ts
        ]
        if cands:
            vts, vid = max(cands)
            out[eid] = (vid, int(ts.timestamp()) - int(vts.timestamp()))
        else:
            out[eid] = (-1, -1)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=events_case)
def test_asof_join_matches_bruteforce(spark, case):
    from distributed_graph_database_spark.pipeline.events import asof_join_frame

    ev = spark.createDataFrame(
        case, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        r.click_id: (r.view_id, r.lag_seconds)
        for r in asof_join_frame(ev).collect()
    }
    assert got == _model(case)
