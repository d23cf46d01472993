"""r11 A/B (VERDICT r10 #5, last remaining candidate): Brandes
backward-pass checkpoint granularity.

Variant A = production `graph_betweenness_multi` (δ eagerly
localCheckpoint'ed at EVERY backward level — BETW_H=4 checkpoint jobs
per run beyond the forward pass).

Variant B = identical kernel except δ is checkpointed only at every
OTHER backward level (the graph_hits r10 halving trick): the skipped
level's δ stays lazy, so its two consumers (next level's succ join +
the final union) each re-evaluate one join+coalesce over
already-checkpointed inputs instead of paying a checkpoint job.
Lineage depth stays bounded at 2 because the next level IS
checkpointed.

Discipline (VERDICT r9/r10): correctness first (sorted-collect
equality A vs B at sf0.01), then 3-run medians + statusTracker job
counts at BOTH sf0.1 and sf1; adopt only if B wins at both.
Writes AB_BRANDES_R11.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_spark.graph import analytics as ga
from distributed_graph_database_spark.session import get_spark

N_RUNS = 3


def betweenness_multi_halved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant B: δ checkpointed on even backward levels only."""
    sym = ga._sym_edges(spark, sf_dir, checkpoint=True)
    seeds = ga._min_id_seeds(sym, ga.BETW_SEEDS)
    lv = [
        seeds.select(
            "s", F.col("s").alias("v"), F.lit(1).cast("bigint").alias("sigma")
        ).localCheckpoint(eager=True)
    ]
    visited = lv[0].select("s", "v")
    for _ in range(ga.BETW_H):
        nxt = (
            sym.join(lv[-1], sym.src == F.col("v"))
            .groupBy("s", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .select("s", F.col("dst").alias("v"), "sigma")
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        lv.append(nxt)
        visited = visited.unionByName(nxt.select("s", "v"))
    delta = lv[ga.BETW_H].select("s", "v", F.lit(0.0).alias("delta"))
    all_delta = [delta]
    for level in range(ga.BETW_H - 1, -1, -1):
        succ = lv[level + 1].join(delta, ["s", "v"]).select(
            F.col("s").alias("ss"),
            F.col("v").alias("w"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        cur = lv[level].select(
            F.col("s").alias("cs"), F.col("v").alias("cv"), "sigma"
        )
        contrib = (
            cur.join(sym, cur.cv == sym.src)
            .join(succ, (F.col("dst") == F.col("w")) & (F.col("cs") == F.col("ss")))
            .groupBy("cs", "cv")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("w_sigma")
                    * (F.lit(1.0) + F.col("w_delta"))
                ).alias("dep")
            )
            .select(F.col("cs").alias("s"), F.col("cv").alias("v"), "dep")
        )
        delta = (
            lv[level]
            .join(contrib, ["s", "v"], "left")
            .select("s", "v", F.coalesce("dep", F.lit(0.0)).alias("delta"))
        )
        if level % 2 == 0:  # halved granularity: checkpoint even levels only
            delta = delta.localCheckpoint(eager=True)
        all_delta.append(delta)
    acc = all_delta[0]
    for d in all_delta[1:]:
        acc = acc.unionByName(d)
    return (
        acc.filter(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("vid"))
        .agg(
            F.count(F.lit(1)).alias("n_seeds"),
            F.round(F.sum("delta"), 6).alias("betweenness"),
        )
    )


def _time(spark, fn, sf_dir, tag):
    sc = spark.sparkContext
    times, jobs = [], []
    for i in range(N_RUNS):
        group = f"ab-{tag}-{i}"
        sc.setJobGroup(group, tag)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times.append(round(time.perf_counter() - t0, 3))
        jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        sc.setJobGroup("idle", "idle")
    return {
        "runs_s": times,
        "median_s": round(statistics.median(times), 3),
        "jobs_per_run": jobs,
    }


def main() -> int:
    spark = get_spark("dgdb-ab-brandes-r11")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    bench.warm_up(spark)

    # correctness leg at sf0.01: A == B exactly
    sf_small = "/root/testdata/sf0.01"
    rows_a = sorted(
        tuple(r) for r in ga.graph_betweenness_multi(spark, sf_small).collect()
    )
    rows_b = sorted(
        tuple(r) for r in betweenness_multi_halved(spark, sf_small).collect()
    )
    assert rows_a == rows_b, "variant B diverges from production kernel"
    print(f"correctness: A==B on {len(rows_a)} rows at sf0.01", flush=True)

    out = {"n_runs": N_RUNS, "load1": os.getloadavg()[0], "legs": {}}
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/dgdb_sf1"):
        bench.run_setup(spark, sf_dir)
        # steady-state: one untimed pass each to fill caches
        ga.graph_betweenness_multi(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        leg = {
            "A_every_level": _time(
                spark, ga.graph_betweenness_multi, sf_dir, "A"
            ),
            "B_halved": _time(spark, betweenness_multi_halved, sf_dir, "B"),
        }
        out["legs"][sf_dir] = leg
        print(json.dumps({sf_dir: leg}), flush=True)
    out["load1_end"] = os.getloadavg()[0]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "AB_BRANDES_R11.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
