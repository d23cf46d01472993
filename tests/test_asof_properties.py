"""Property test: the merge-scan as-of join equals a brute-force
model on random event sets (random users, duplicate timestamps,
clicks with no prior view — the tie and edge cases the fixed testdata
may never hit)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_range_join_matches_model_on_random_events(spark, data):
    """Band-bucketing must be invisible: counts equal the naive
    all-pairs semantics for arbitrary timestamps, including band
    boundaries (multiples of RANGE_JOIN_BAND_S are explicitly likely
    under the generator's coarse grid)."""
    from distributed_graph_database_spark.pipeline.events import (
        RANGE_JOIN_BAND_S,
        range_join_frame,
    )

    n = data.draw(st.integers(min_value=1, max_value=30))
    base = 1_700_000_000
    rows = []
    for i in range(n):
        # coarse grid => frequent exact-boundary collisions
        off = data.draw(
            st.integers(min_value=0, max_value=8) 
        ) * (RANGE_JOIN_BAND_S // 2)
        jitter = data.draw(st.integers(min_value=0, max_value=2))
        typ = data.draw(st.sampled_from(["view", "click", "purchase"]))
        rows.append((i, base + off + jitter, typ))
    ev = spark.createDataFrame(
        [(i, s, t) for i, s, t in rows],
        "event_id bigint, s bigint, event_type string",
    ).select("event_id", F.timestamp_seconds("s").alias("ts"), "event_type")
    got = {
        r.view_id: r.n_clicks_5min for r in range_join_frame(ev).collect()
    }
    clicks = [s for _, s, t in rows if t == "click"]
    want = {
        i: sum(1 for c in clicks if s <= c < s + RANGE_JOIN_BAND_S)
        for i, s, t in rows
        if t == "view"
    }
    assert got == want


def _nearest_model(rows):
    """Brute force for the bidirectional variant: nearest view by
    |Δt| at full precision; ties → backward, then max id backward /
    min id forward."""
    out = {}
    for eid, ts, user, kind in rows:
        if kind != "click":
            continue
        views = [
            (vid, vts)
            for vid, vts, vuser, vkind in rows
            if vkind == "view" and vuser == user
        ]
        if not views:
            out[eid] = (-1, 0, "")
            continue
        best = None
        for vid, vts in views:
            back = vts <= ts
            key = (abs(ts - vts), 0 if back else 1, -vid if back else vid)
            if best is None or key < best[0]:
                best = (key, vid, vts, back)
        _, vid, vts, back = best
        lag = int(ts.timestamp()) - int(vts.timestamp())
        out[eid] = (vid, lag, "back" if back else "fwd")
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=events_case)
def test_asof_nearest_matches_bruteforce(spark, case):
    from distributed_graph_database_spark.pipeline.events import asof_nearest_frame

    ev = spark.createDataFrame(
        case, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        r.click_id: (r.view_id, r.lag_seconds, r.direction)
        for r in asof_nearest_frame(ev).collect()
    }
    assert got == _nearest_model(case)
