"""Catalog normalization regression pins (VERDICT r4).

The driver regenerated the testdata between rounds and silently changed
`events.ts` from TIMESTAMP(NANOS)-as-int64 to TIMESTAMP_NTZ, breaking
three keys. These tests make the next such shift fail loudly in ONE
obvious place: the raw parquet dtype is pinned, the catalog's
normalized dtype is pinned, and the epoch semantics the events family
depends on are pinned against hand-computed UTC values.
"""

from __future__ import annotations

import datetime as dt

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline.events import (
    RANGE_JOIN_BAND_S,
    range_join_frame,
)
from distributed_graph_database_spark.sources import formats


def test_raw_events_ts_is_ntz_micros(sf_smoke):
    """Pin the on-disk shape. If the driver regenerates testdata with a
    different ts encoding, THIS is the test that should fail first."""
    field = pq.read_schema(f"{sf_smoke}/events.parquet").field("ts")
    assert str(field.type) == "timestamp[us]", (
        "events.ts parquet type changed — update catalog.table's "
        f"normalization (got {field.type})"
    )


def test_catalog_normalizes_ts_to_session_timestamp(spark, sf_smoke):
    ev = table(spark, sf_smoke, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # and the session is pinned UTC so NTZ→instant is deterministic
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_ts_epoch_matches_utc_wallclock(spark, sf_smoke):
    """NTZ wall-clock read as UTC instant: epoch extraction must agree
    with a driver-side UTC computation on the same wall-clock values —
    the exact contract the DuckDB oracle's EPOCH(ts) assumes."""
    row = (
        table(spark, sf_smoke, "events")
        .select("ts", F.unix_timestamp("ts").alias("epoch"))
        .orderBy("ts")
        .first()
    )
    want = row.ts.replace(tzinfo=dt.timezone.utc).timestamp()
    assert row.epoch == int(want)


def test_range_join_bucket_boundaries_exact(spark):
    """Band-bucket assignment on boundary-straddling fixtures: events
    exactly ON a bucket boundary and one second either side must match
    brute-force [v, v+band) semantics (VERDICT r4 item 6)."""
    base = dt.datetime(1997, 6, 1, 0, 0, 0)  # epoch % band == 0 for 300s
    assert int(base.replace(tzinfo=dt.timezone.utc).timestamp()) % RANGE_JOIN_BAND_S == 0
    sec = dt.timedelta(seconds=1)
    band = dt.timedelta(seconds=RANGE_JOIN_BAND_S)
    rows = [
        (1, "view", base),                      # window [base, base+band)
        (2, "view", base + sec),                # window (base+1 .. +band+1)
        (3, "click", base - sec),               # before both
        (4, "click", base),                     # in v1 only
        (5, "click", base + band - sec),        # in v1 and v2
        (6, "click", base + band),              # boundary: v2 only
        (7, "click", base + band + sec),        # == v2 + band: excluded
        (8, "click", base + 2 * band),          # beyond both
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {
        r.view_id: r.n_clicks_5min for r in range_join_frame(ev).collect()
    }
    clicks = [r[2] for r in rows if r[1] == "click"]
    want = {
        vid: sum(1 for c in clicks if v <= c < v + band)
        for vid, kind, v in rows
        if kind == "view"
    }
    assert got == want == {1: 2, 2: 2}


def test_store_sorted_prune_is_not_vacuous(spark, sf_oracle):
    """The clustered-scan demo must actually scan rows (VERDICT r4: the
    1994 window returned 0 rows in both engines) and must push the date
    window down to the parquet scan."""
    df = formats.store_sorted_prune(spark, sf_oracle)
    assert df.count() > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "o_orderdate" in pushed, plan
