"""One leg of the r12 ingest probe in a FRESH process.

The all-in-one tools/ingest_probe_r12.py run died mid-flight at the
sf10 flat-cells∝N leg (the DAGScheduler event loop threw during the
8e8-row assign and stopped the SparkContext), so each remaining
(variant, sf) leg runs in its own process and MERGES its rows into
SCALE_PROBE_SF10_INGEST.json — which also makes a leg-level crash an
isolated, recordable outcome instead of a lost session.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/ingest_leg_r12.py \
      --variant knn_sqrtN_narrow|knn_cellsN_narrow|knn_cellsN_2level|\
                dedup_embed_sqrtN_narrow|dedup_embed_cellsN_narrow \
      --leg small|big [--sf-dir DIR] [--runs 2] [--recall]
      [--occupancy 50] [--out SCALE_PROBE_SF10_INGEST.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_DIRS = {"small": "/tmp/dgdb_sf1", "big": "/tmp/dgdb_sf10"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--leg", required=True, choices=["small", "big"])
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--occupancy", type=int, default=50)
    ap.add_argument("--out", default="SCALE_PROBE_SF10_INGEST.json")
    args = ap.parse_args()
    sf_dir = args.sf_dir or DEFAULT_DIRS[args.leg]

    import bench
    from distributed_graph_database_spark.session import get_spark
    from distributed_graph_database_spark.pipeline import similarity as sim

    spark = get_spark(f"dgdb-ingest-leg-{args.variant}-{args.leg}")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark)

    def cells_n() -> int:
        return max(sim.IVF_CELLS, sim._corpus_n(spark, sf_dir) // args.occupancy)

    builds = {
        "knn_sqrtN_narrow": lambda: sim._sim_knn_graph_flat(spark, sf_dir),
        "knn_cellsN_narrow": lambda: sim._sim_knn_graph_flat(
            spark, sf_dir, n_cells=cells_n()
        ),
        "knn_cellsN_2level": lambda: sim._sim_knn_graph_2level(
            spark, sf_dir, n_cells=cells_n()
        ),
        "dedup_embed_sqrtN_narrow": lambda: sim._dedup_embed_flat(spark, sf_dir),
        "dedup_embed_cellsN_narrow": lambda: sim._dedup_embed_flat(
            spark, sf_dir, n_cells=cells_n()
        ),
        "dedup_embed_cellsN_2level": lambda: sim._dedup_embed_2level(
            spark, sf_dir, n_cells=cells_n()
        ),
    }
    build = builds[args.variant]

    runs: list[float] = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 2))
        print(f"{args.leg} {args.variant}: {runs[-1]} s", file=sys.stderr)

    recall = None
    if args.recall:
        exact = sim._knn_exact_topk(spark, sf_dir).localCheckpoint(eager=True)
        knn = build().select("src_id", "neighbor_id")
        hits = exact.join(knn, ["src_id", "neighbor_id"], "left_semi").count()
        recall = round(hits / exact.count(), 4)
        print(f"{args.leg} {args.variant}: recall {recall}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    out = json.load(open(path)) if os.path.exists(path) else {"legs": {}}
    leg_rec = out.setdefault("legs", {}).setdefault(
        args.leg, {"sf_dir": sf_dir, "timings": {}, "recall_at_k": {}}
    )
    if runs:  # --runs 0 = recall-only pass; keep prior timings
        leg_rec.setdefault("timings", {})[args.variant] = runs
    if recall is not None:
        leg_rec.setdefault("recall_at_k", {})[args.variant] = recall
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({args.variant: {args.leg: runs, "recall": recall}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
