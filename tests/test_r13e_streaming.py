"""Round-13 streaming twins: the stateless scrub stream and the
custom-stateful transitions stream. Beyond the declared keys' shared-
oracle parity (covered by the sweep), the transitions operator's
cross-batch state carry — a consecutive pair whose two events land in
DIFFERENT micro-batches must be counted exactly once — is pinned here
with a 3-file time-ordered staging forced into separate batches."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import events as ev_mod
from distributed_graph_database_spark.streaming import events_stream as es
from .oracle_harness import assert_parity


def test_stream_scrub_parity(spark, sf_smoke):
    assert_parity(
        es.QUERIES["stream_scrub"](spark, sf_smoke),
        es.ORACLE_SQL["stream_scrub"],
        sf_smoke,
        "stream_scrub",
    )


def test_stream_transitions_parity(spark, sf_smoke):
    assert_parity(
        es.QUERIES["stream_transitions"](spark, sf_smoke),
        es.ORACLE_SQL["stream_transitions"],
        sf_smoke,
        "stream_transitions",
    )


def test_transitions_state_carries_across_batches(spark, sf_smoke, tmp_path_factory):
    """Split the events table into 3 time-ordered files, force one
    micro-batch per file, and assert the drained transition counts
    still equal the batch window's — i.e. the (last-event state →
    first event of the next batch) pairs are neither lost nor
    double-counted."""
    src = tmp_path_factory.mktemp("trans_src")
    ev = table(spark, sf_smoke, "events")
    bounds = ev.select(
        F.expr(
            "percentile(unix_micros(ts), "
            "array(CAST(1.0/3 AS DOUBLE), CAST(2.0/3 AS DOUBLE)))"
        ).alias("b")
    ).collect()[0].b
    lo, hi = int(bounds[0]), int(bounds[1])
    parts = [
        ev.filter(F.unix_micros("ts") <= lo),
        ev.filter((F.unix_micros("ts") > lo) & (F.unix_micros("ts") <= hi)),
        ev.filter(F.unix_micros("ts") > hi),
    ]
    for i, p in enumerate(parts):
        d = src / f"stage{i}"
        p.coalesce(1).write.mode("overwrite").parquet(str(d))
        f = [
            x
            for x in os.listdir(d)
            if x.endswith(".parquet") and not x.startswith(("_", "."))
        ][0]
        dst = str(src / f"batch_{i}.parquet")
        os.rename(str(d / f), dst)
        # the file source orders micro-batches by modification time
        t = time.time() + i * 10
        os.utime(dst, (t, t))
    import shutil

    for i in range(3):
        shutil.rmtree(str(src / f"stage{i}"))

    name = "trans_multibatch"
    with es._state_partitions(spark):
        q = (
            es.transitions_stream(spark, str(src), max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    res = spark.table(name)
    got = {
        (r.prev_type, r.event_type): r.n
        for r in res.groupBy("prev_type", "event_type")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .collect()
    }
    want = {
        (r.prev_type, r.event_type): r.n
        for r in ev_mod.QUERIES["events_transitions"](spark, sf_smoke)
        .select("prev_type", "event_type", "n")
        .collect()
    }
    assert got == want
