"""Enforced scale guards (VERDICT r4 item 7): the basket-size cap on
the co-purchase projection and the salted band key on the range join
were documented prose — these tests pin that (a) the guards are real
constants in the plan, and (b) they are output-invariant on sane data,
i.e. the guard changes WHERE work happens, not WHAT comes out.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.graph import analytics
from distributed_graph_database_spark.pipeline.events import (
    RANGE_JOIN_BAND_S,
    RANGE_JOIN_SALTS,
    range_join_frame,
)


def test_copurchase_cap_is_inactive_on_testdata(spark, sf_smoke):
    """TPC-H baskets are ≤ 7 distinct parts — far under the cap — so
    the capped projection must equal the uncapped one row-for-row."""
    li = (
        table(spark, sf_smoke, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    max_basket = (
        li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    )
    assert max_basket <= analytics.COPURCHASE_MAX_BASKET

    a, b = li.alias("a"), li.alias("b")
    uncapped = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= analytics.COPURCHASE_MIN_ORDERS)
    )
    got = {tuple(r) for r in analytics._copurchase_impl(spark, sf_smoke).collect()}
    want = {tuple(r) for r in uncapped.collect()}
    assert got == want and got


def test_copurchase_cap_drops_mega_basket(spark, sf_smoke):
    """And the cap actually bites: an adversarial order with
    CAP+1 parts contributes zero pairs."""
    li = table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_partkey")
    mega = spark.createDataFrame(
        [(999_999_999, 10_000_000 + i) for i in range(analytics.COPURCHASE_MAX_BASKET + 1)],
        "l_orderkey long, l_partkey long",
    )
    # splice the mega-basket in through the same projection logic
    from pyspark.sql import Window

    spliced = li.unionByName(mega).distinct()
    basket = Window.partitionBy("l_orderkey")
    capped = spliced.withColumn("n", F.count(F.lit(1)).over(basket)).filter(
        F.col("n") <= analytics.COPURCHASE_MAX_BASKET
    )
    assert capped.filter(F.col("l_orderkey") == 999_999_999).count() == 0


def test_range_join_salt_is_output_invariant_on_hot_band(spark):
    """A viral burst — many clicks inside ONE band — must produce
    identical counts under the salted join as a brute-force model,
    and the burst's clicks must actually spread across the salts."""
    base = dt.datetime(1997, 6, 1, 0, 0, 0)
    sec = dt.timedelta(seconds=1)
    rows = [(i, "click", base + (i % RANGE_JOIN_BAND_S) * sec) for i in range(500)]
    rows += [
        (1000, "view", base),
        (1001, "view", base + dt.timedelta(seconds=150)),
        (1002, "view", base + dt.timedelta(seconds=RANGE_JOIN_BAND_S * 3)),  # empty window
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = {r.view_id: r.n_clicks_5min for r in range_join_frame(ev).collect()}
    band = dt.timedelta(seconds=RANGE_JOIN_BAND_S)
    clicks = [r[2] for r in rows if r[1] == "click"]
    want = {
        vid: sum(1 for c in clicks if v <= c < v + band)
        for vid, kind, v in rows
        if kind == "view"
    }
    assert got == want
    assert got[1002] == 0  # zero row survives the salted left join

    salts = (
        ev.filter(F.col("event_type") == "click")
        .select(F.pmod(F.hash("event_id"), F.lit(RANGE_JOIN_SALTS)).alias("salt"))
        .distinct()
        .count()
    )
    assert salts == RANGE_JOIN_SALTS


def test_frontier_broadcast_gate_is_bytes_based(spark, monkeypatch):
    """VERDICT r6 item 5: the BFS frontier broadcast must gate on
    estimated BYTES, and above the gate the frontier must flow to a
    shuffle join (no broadcast hint). Pin both arms of the gate and
    that the fallback path computes the same BFS levels."""
    from distributed_graph_database_spark.graph import traversal

    fr = spark.range(10).selectExpr("id as vid")
    # Below gate → hinted plan (a new DataFrame carrying the hint).
    probe = traversal._frontier_probe(fr, frontier_rows=10)
    assert "broadcast" in probe._jdf.queryExecution().logical().toString().lower()
    # Above gate → the exact same un-hinted frame back.
    monkeypatch.setattr(traversal, "BROADCAST_FRONTIER_MAX_BYTES", 0)
    assert traversal._frontier_probe(fr, frontier_rows=10) is fr

    # Functional: shuffle-join fallback produces identical levels.
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(0, 1), (1, 2), (2, 3), (1, 4)]],
        "src bigint, dst bigint",
    )
    edges_sym = edges.union(edges.selectExpr("dst as src", "src as dst"))
    got = {
        (r.vid, r.level)
        for r in traversal.bfs_levels(
            spark, edges_sym, 0, cache_edges=False
        ).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 2), (4, 2), (3, 3)}
