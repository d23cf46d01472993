"""Events: batch↔streaming equivalence smoke (the batch versions are
the oracle-checked contract; the streaming twins must converge to the
same final state when the source is drained with availableNow)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from distributed_graph_database_spark.pipeline import events
from distributed_graph_database_spark.streaming import events_stream


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-source streams need a directory; stage the events parquet
    into one (read-only testdata stays untouched)."""
    d = tmp_path_factory.mktemp("events_src")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_stream_matches_batch(spark, sf_smoke, events_dir):
    batch = {
        (r.hour, r.event_type): (r.n_events, r.sum_value_cents)
        for r in events.events_tumbling(spark, sf_smoke).collect()
    }
    streamed = events_stream.run_available_now(
        events_stream.tumbling_stream(spark, events_dir), "tumbling_smoke"
    )
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value_cents)
        for r in streamed.collect()
    }
    assert got == batch


def test_hopping_stream_matches_batch(spark, sf_smoke, events_dir):
    batch = {
        (r.hop_start, r.event_type): (r.n_events, r.sum_value_cents)
        for r in events.events_hopping(spark, sf_smoke).collect()
    }
    streamed = events_stream.run_available_now(
        events_stream.hopping_stream(spark, events_dir), "hopping_smoke"
    )
    got = {
        (r.hop_start, r.event_type): (r.n_events, r.sum_value_cents)
        for r in streamed.collect()
    }
    assert got == batch


def test_sessionize_stream_matches_batch_sessions(spark, sf_smoke, events_dir):
    batch = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value_cents)
        for r in events.events_sessionize(spark, sf_smoke).collect()
    }
    streamed = events_stream.run_available_now(
        events_stream.sessionize_stream(spark, events_dir), "sessionize_smoke"
    )
    got = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value_cents)
        for r in streamed.collect()
    }
    assert got == batch


def test_stateful_user_totals_matches_batch(spark, sf_smoke, events_dir):
    """applyInPandasWithState running totals, drained with availableNow,
    equal the batch per-user aggregate."""
    from distributed_graph_database_spark.catalog import table

    batch = {
        (r.user_id): (r.n_events, r.sum_value_cents)
        for r in table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "sum_value_cents"
            ),
        )
        .collect()
    }
    streamed = events_stream.run_available_now(
        events_stream.user_totals_stream(spark, events_dir),
        "user_totals_smoke",
        mode="update",
    )
    # In update mode a user spanning micro-batches emits one row per
    # batch; the final state is the row with max n_events (running
    # totals are monotone) — never rely on the memory sink preserving
    # batch order in collect() (ADVICE r2).
    got = {}
    for r in streamed.collect():
        prev = got.get(r.user_id)
        if prev is None or r.n_events > prev[0]:
            got[r.user_id] = (r.n_events, r.sum_value_cents)
    assert got == batch


def test_dedup_stream_collapses_duplicate_deliveries(
    spark, sf_smoke, tmp_path_factory
):
    """dropDuplicatesWithinWatermark: the same events file delivered
    TWICE (the at-least-once transport reality) dedups back to the
    single-copy batch counts."""
    from distributed_graph_database_spark.catalog import table

    d = tmp_path_factory.mktemp("events_dup_src")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-0.parquet")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-1.parquet")

    batch = {
        r.event_type: r.n_events
        for r in table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    streamed = events_stream.run_available_now(
        events_stream.dedup_stream(spark, str(d)), "dedup_smoke"
    )
    got = {r.event_type: r.n_events for r in streamed.collect()}
    assert got == batch


def test_sessionize_gap_semantics(spark, sf_oracle):
    """No intra-session gap exceeds the threshold; consecutive sessions
    of one user are separated by more than the gap."""
    sess = events.events_sessionize(spark, sf_oracle)
    w = sess.select(
        "user_id",
        F.col("session_start").cast("timestamp").cast("long").alias("s"),
        F.col("session_end").cast("timestamp").cast("long").alias("e"),
    )
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("s")
    gaps = (
        w.withColumn("prev_end", F.lag("e").over(order))
        .filter(F.col("prev_end").isNotNull())
        .withColumn("gap", F.col("s") - F.col("prev_end"))
    )
    bad = gaps.filter(F.col("gap") <= events.SESSION_GAP_MIN * 60).count()
    assert bad == 0
