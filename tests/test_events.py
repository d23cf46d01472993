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


def test_watermark_drops_late_rows(spark, tmp_path_factory):
    """The watermark CONTRACT, not just convergence: an event arriving
    in a later micro-batch with event time behind the watermark must be
    excluded from the aggregation (and the closed window must not
    re-emit), while the same data in batch mode counts it. Three files
    forced into three micro-batches via maxFilesPerTrigger=1, ordered
    by modification time. The late row lands TWO batches after the
    watermark driver: Spark filters late events against the PREVIOUS
    batch's watermark (the chained-stateful-operator semantics), so a
    row arriving in the very next batch after the driver is still
    admitted — pinned here because the twins' availableNow smoke tests
    would never catch a regression in this behavior."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import functions as F

    src = tmp_path_factory.mktemp("late_src")
    stage = tmp_path_factory.mktemp("late_stage")
    T = dt.datetime(2000, 1, 1, 0, 30)

    def stage_file(name, rows, mtime):
        d = str(stage / name)
        spark.createDataFrame(
            rows, "event_id long, event_type string, user_id long, value double, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        part = glob.glob(f"{d}/part-*.parquet")[0]
        dst = str(src / f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))
        return dst

    # batch 0: three in-window clicks + a watermark driver at 05:00
    # => watermark after batch 0 = 03:00, window [00:00, 01:00) closes
    stage_file(
        "a",
        [
            (1, "click", 1, 1.0, T),
            (2, "click", 1, 1.0, T),
            (3, "click", 2, 1.0, T),
            (4, "click", 3, 1.0, T.replace(hour=5, minute=0)),
        ],
        1_000_000_000,
    )
    # batch 1: an on-time event whose window never closes before
    # end-of-stream (and advances the watermark to 04:00)
    stage_file("b", [(6, "click", 5, 1.0, T.replace(hour=6, minute=0))], 1_000_000_100)
    # batch 2: one LATE click — 00:45 is behind the previous batch's
    # 03:00 watermark, so it must be dropped, not re-open the window
    stage_file("c", [(5, "click", 4, 1.0, T.replace(minute=45))], 1_000_000_200)

    schema = spark.read.parquet(str(src)).schema
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.w.start.isoformat(), r.event_type): r.n
        for r in spark.table("late_smoke").collect()
    }
    # late click NOT counted (batch mode would say 4); closed window
    # emitted exactly once; unclosed windows (05:00, 06:00) withheld
    assert got == {("2000-01-01T00:00:00", "click"): 3}


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


def test_stream_dedup_matches_batch_events_dedup(spark, sf_smoke):
    """The declared stream_dedup key's contract (VERDICT r5 item 2):
    the drained streaming burst-dedup, reduced per type, must equal the
    batch events_dedup key's n_kept exactly."""
    batch = {
        r.event_type: r.n_kept
        for r in events.events_dedup(spark, sf_smoke).collect()
    }
    streamed = {
        r.event_type: r.n_kept
        for r in events_stream.stream_dedup(spark, sf_smoke).collect()
    }
    assert streamed == batch
