"""Durable-sink + checkpoint recovery (VERDICT r5 'what's missing'
#3): the declared stream_* keys drain to a memory sink, which is the
smoke surface — production streams write a durable sink under a
checkpointLocation and must survive a restart without dropping or
double-counting. This test demonstrates both on the real engine:

1. run a parquet-file-sink stream (exactly-once via the sink's
   transaction log) over a directory with maxFilesPerTrigger=1,
2. STOP it mid-stream (after the first micro-batch commits),
3. restart the SAME query from the SAME checkpointLocation,
4. assert the drained sink equals the batch answer — every input row
   exactly once despite the kill/restart.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F


def test_file_sink_checkpoint_recovery(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("ckpt_src")
    sink = str(tmp_path_factory.mktemp("ckpt_sink"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_state"))

    # three source files, forced into separate micro-batches
    for i in range(3):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "id % 7 AS k"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
        # flatten: the file source watches one directory
        part = [
            p
            for p in os.listdir(src / f"f{i}")
            if p.endswith(".parquet") and not p.startswith(("_", "."))
        ][0]
        shutil.move(str(src / f"f{i}" / part), str(src / f"batch_{i}.parquet"))
        shutil.rmtree(str(src / f"f{i}"))

    schema = spark.read.parquet(str(src)).schema

    def start_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withColumn("doubled", F.col("id") * 2)
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    # phase 1: let at least one micro-batch commit, then stop mid-way
    q = start_query()
    deadline = time.time() + 60
    while time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    # phase 2: restart from the same checkpoint; drain everything left
    q2 = start_query()
    deadline = time.time() + 120
    while time.time() < deadline:
        done = spark.read.parquet(sink).count()
        if done >= 300:
            break
        time.sleep(0.3)
    q2.stop()
    q2.awaitTermination()

    got = spark.read.parquet(sink)
    # exactly-once: 300 distinct ids, no duplicates from the restart
    assert got.count() == 300
    assert got.select("id").distinct().count() == 300
    assert got.agg(F.sum("doubled")).first()[0] == 2 * sum(range(300))
