"""Degenerate-input behavior of the extracted operator cores (empty
sides, no matches, single rows) — the inputs a production pipeline hits
on its first day and a hash check over healthy testdata never
exercises."""

from __future__ import annotations

import datetime as dt

from distributed_graph_database_spark.pipeline.events import (
    asof_join_frame,
    range_join_frame,
)

EV_SCHEMA = "event_id long, event_type string, user_id long, ts timestamp"
T = dt.datetime(1997, 6, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, ts) for (i, t, u, ts) in rows], EV_SCHEMA
    )


def test_range_join_no_clicks_emits_zero_rows_per_view(spark):
    ev = _ev(spark, [(1, "view", 1, T), (2, "view", 2, T + dt.timedelta(hours=1))])
    got = {r.view_id: r.n_clicks_5min for r in range_join_frame(ev).collect()}
    assert got == {1: 0, 2: 0}


def test_range_join_no_views_is_empty(spark):
    ev = _ev(spark, [(1, "click", 1, T), (2, "click", 2, T)])
    assert range_join_frame(ev).count() == 0


def test_range_join_empty_input_is_empty(spark):
    assert range_join_frame(_ev(spark, [])).count() == 0


def test_asof_join_click_without_prior_view_gets_sentinels(spark):
    ev = _ev(
        spark,
        [
            (1, "click", 7, T),                          # no view at all
            (2, "view", 8, T + dt.timedelta(seconds=10)),  # view AFTER click
            (3, "click", 8, T),
        ],
    )
    got = {r.click_id: (r.view_id, r.view_ts, r.lag_seconds)
           for r in asof_join_frame(ev).collect()}
    assert got == {1: (-1, "", -1), 3: (-1, "", -1)}


def test_asof_join_same_timestamp_view_counts_with_max_id_tiebreak(spark):
    ev = _ev(
        spark,
        [
            (10, "view", 1, T),
            (11, "view", 1, T),   # same ts — max event_id must win
            (12, "click", 1, T),  # same ts as the views: <= semantics
        ],
    )
    (row,) = asof_join_frame(ev).collect()
    assert (row.click_id, row.view_id, row.lag_seconds) == (12, 11, 0)


def test_asof_join_empty_input_is_empty(spark):
    assert asof_join_frame(_ev(spark, [])).count() == 0
