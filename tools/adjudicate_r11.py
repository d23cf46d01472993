"""r11 adjudication harness (VERDICT r10 #1): 3-run medians + job
counts for the two r10 perf-watch keys (graph_ppr_multi,
mm_audio_clusters) whose kernels are UNCHANGED since the r9 verdict
commit (d7919de) — the A/B is therefore measurement-vs-measurement:
if idle-ish medians land back in the r9 band, the r10 driver numbers
were host-load noise (BASELINE.md's documented diffuse signature).

Runs at sf0.1 on the bench config; shared setup artifacts are filled
first exactly like bench.py so the timed loop measures steady state.
Prints one JSON line per key and writes ADJUDICATE_R11.json."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from distributed_graph_database_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ["graph_ppr_multi", "mm_audio_clusters"]
N_RUNS = 3


def main() -> None:
    spark = get_spark("dgdb-adjudicate-r11")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import bench
    from distributed_graph_database_spark import registry

    bench.warm_up(spark)
    t0 = time.perf_counter()
    bench.run_setup(spark, SF_DIR)
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)

    out = {"sf_dir": SF_DIR, "n_runs": N_RUNS, "load1": os.getloadavg()[0]}
    for key in KEYS:
        fn = registry.QUERIES[key]
        times, jobs = [], []
        for i in range(N_RUNS):
            group = f"adj-{key}-{i}"
            sc.setJobGroup(group, key)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            sc.setJobGroup("idle", "idle")
        out[key] = {
            "runs_s": times,
            "median_s": round(statistics.median(times), 3),
            "jobs_per_run": jobs,
        }
        print(json.dumps({key: out[key]}), flush=True)
    out["load1_end"] = os.getloadavg()[0]
    with open("/root/repo/ADJUDICATE_R11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
