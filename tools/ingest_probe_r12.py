"""Second-decade INGEST re-linearization probe (VERDICT r11 next #1).

The r11 probe (SCALE_PROBE_SF10.json) measured the two
designed-superlinear ingest builds at sf1→sf10:

    sim_knn_graph_result  28.0 → 1350.7 s  exp 1.68  (model: N^1.5)
    dedup_embed_pairs     73.3 → 1183.1 s  exp 1.21  (model: N^1.5)

Two claims needed proof:
  1. the 1.68-over-model residual — suspected sort-payload spill: the
     assign rank window carried the 64-dim vector through N·cells
     sorted rows (~49 GB at sf10). r12 narrowed the window (only
     (key, cell_id, sim) rides the exchange+sort; the vector rejoins
     by key after the top-n filter) — this probe measures the SAME
     default √N-cells build under the narrow plan.
  2. the docstring knob "a deployment sizes cells ∝ N to re-linearize"
     — measured here as n_cells = N / OCCUPANCY (candidate work
     N·P·OCC = linear), with the recall@K of each variant scored
     against ONE shared exact side per sf so the knob's quality cost
     is part of the record, not a claim.

Each (variant, sf) leg runs twice in one session; the steady-state
(second) run feeds the exponent, mirroring the r10 recheck
discipline. Output: SCALE_PROBE_SF10_INGEST.json.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/ingest_probe_r12.py \
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


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/tmp/dgdb_sf1")
    ap.add_argument("--big", default="/tmp/dgdb_sf10")
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--occupancy", type=int, default=50)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="SCALE_PROBE_SF10_INGEST.json")
    ap.add_argument("--skip-recall", action="store_true")
    args = ap.parse_args()

    import bench
    from distributed_graph_database_spark.session import get_spark
    from distributed_graph_database_spark.pipeline import similarity as sim
    from pyspark.sql import functions as F

    spark = get_spark("dgdb-ingest-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_up(spark)

    occ = args.occupancy

    def cells_n(sf_dir: str) -> int:
        n = sim._corpus_n(spark, sf_dir)
        return max(sim.IVF_CELLS, n // occ)

    # (variant name, build fn) — every build is the real module code,
    # fresh plan per run (no cache.shared), same session.
    knn_variants = {
        "knn_sqrtN_narrow": lambda sf: sim._sim_knn_graph_flat(spark, sf),
        "knn_cellsN_narrow": lambda sf: sim._sim_knn_graph_flat(
            spark, sf, n_cells=cells_n(sf)
        ),
    }
    dedup_variants = {
        "dedup_embed_sqrtN_narrow": lambda sf: sim._dedup_embed_flat(spark, sf),
        "dedup_embed_cellsN_narrow": lambda sf: sim._dedup_embed_flat(
            spark, sf, n_cells=cells_n(sf)
        ),
    }

    legs: dict[str, dict] = {}
    for leg, sf_dir in (("small", args.small), ("big", args.big)):
        n = sim._corpus_n(spark, sf_dir)
        rec: dict = {
            "sf_dir": sf_dir,
            "corpus_n": n,
            "cells_sqrtN": sim.scaled_cells(n, sim.IVF_CELLS),
            "cells_propN": cells_n(sf_dir),
            "timings": {},
            "recall_at_k": {},
        }
        for name, build in {**knn_variants, **dedup_variants}.items():
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                _noop(build(sf_dir))
                runs.append(round(time.perf_counter() - t0, 2))
                print(f"{leg} {name}: {runs[-1]} s", file=sys.stderr)
            rec["timings"][name] = runs
        if not args.skip_recall:
            # ONE exact side per sf, scored against both knn variants.
            exact = sim._knn_exact_topk(spark, sf_dir).localCheckpoint(
                eager=True
            )
            for name, build in knn_variants.items():
                knn = build(sf_dir).select("src_id", "neighbor_id")
                hits = exact.join(
                    knn, ["src_id", "neighbor_id"], "left_semi"
                ).count()
                total = exact.count()
                rec["recall_at_k"][name] = round(hits / total, 4)
                print(
                    f"{leg} {name}: recall@{sim.KNN_K} "
                    f"{rec['recall_at_k'][name]}",
                    file=sys.stderr,
                )
        legs[leg] = rec

    report = {}
    for name in list(knn_variants) + list(dedup_variants):
        t0 = legs["small"]["timings"][name][-1]  # steady-state run
        t1 = legs["big"]["timings"][name][-1]
        report[name] = {
            "t_small_runs": legs["small"]["timings"][name],
            "t_big_runs": legs["big"]["timings"][name],
            "exponent_steady": round(
                math.log(max(t1, 1e-4) / max(t0, 1e-4))
                / math.log(args.ratio),
                3,
            ),
        }
    out = {
        "ratio": args.ratio,
        "occupancy": occ,
        "r11_wide_baseline": {
            "sim_knn_graph_result": {"t_small": 28.0, "t_big": 1350.7,
                                     "exponent": 1.68},
            "dedup_embed_pairs": {"t_small": 73.3, "t_big": 1183.1,
                                  "exponent": 1.21},
        },
        "legs": legs,
        "report": report,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
