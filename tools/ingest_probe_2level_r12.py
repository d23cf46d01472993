"""Second pass of the r12 ingest probe: the TWO-LEVEL quantizer
variant (see similarity._sim_knn_graph_2level). Run AFTER
ingest_probe_r12.py; merges its rows into SCALE_PROBE_SF10_INGEST.json
so the whole ingest story lives in one artifact.

The flat cells ∝ N knob re-linearizes the candidate join but its
assign stage is N·cells = N²/occupancy dot products — quadratic with
a 1/occ constant. The 2-level routing replaces that with
N·(√cells + COARSE_PROBES·cells/√cells) ≈ 3N√cells — the asymptotic
fix this pass measures, with recall@K scored against the same exact
side.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/ingest_probe_2level_r12.py \
      [--small /tmp/dgdb_sf1] [--big /tmp/dgdb_sf10] [--occupancy 50]
      [--runs 2] [--out SCALE_PROBE_SF10_INGEST.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/tmp/dgdb_sf1")
    ap.add_argument("--big", default="/tmp/dgdb_sf10")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--occupancy", type=int, default=50)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="SCALE_PROBE_SF10_INGEST.json")
    args = ap.parse_args()

    import bench
    from distributed_graph_database_spark.session import get_spark
    from distributed_graph_database_spark.pipeline import similarity as sim

    spark = get_spark("dgdb-ingest-probe-2level-r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark)

    name = "knn_cellsN_2level"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    out = json.load(open(path)) if os.path.exists(path) else {
        "ratio": args.ratio, "occupancy": args.occupancy,
        "legs": {}, "report": {},
    }

    timings: dict[str, list[float]] = {}
    for leg, sf_dir in (("small", args.small), ("big", args.big)):
        n = sim._corpus_n(spark, sf_dir)
        n_cells = max(sim.IVF_CELLS, n // args.occupancy)
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            sim._sim_knn_graph_2level(spark, sf_dir, n_cells).write.mode(
                "overwrite"
            ).format("noop").save()
            runs.append(round(time.perf_counter() - t0, 2))
            print(f"{leg} {name}: {runs[-1]} s", file=sys.stderr)
        timings[leg] = runs
        exact = sim._knn_exact_topk(spark, sf_dir).localCheckpoint(eager=True)
        knn = sim._sim_knn_graph_2level(spark, sf_dir, n_cells).select(
            "src_id", "neighbor_id"
        )
        hits = exact.join(knn, ["src_id", "neighbor_id"], "left_semi").count()
        recall = round(hits / exact.count(), 4)
        print(f"{leg} {name}: recall@{sim.KNN_K} {recall}", file=sys.stderr)
        leg_rec = out["legs"].setdefault(
            leg, {"sf_dir": sf_dir, "timings": {}, "recall_at_k": {}}
        )
        leg_rec["timings"][name] = runs
        leg_rec["recall_at_k"][name] = recall

    out["report"][name] = {
        "t_small_runs": timings["small"],
        "t_big_runs": timings["big"],
        "exponent_steady": round(
            math.log(max(timings["big"][-1], 1e-4)
                     / max(timings["small"][-1], 1e-4))
            / math.log(args.ratio),
            3,
        ),
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["report"][name], indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
