"""One LEG of the full-surface second-decade probe (VERDICT r12 next
#2): fresh process, 48g heap (caller sets SPARK_GRAFT_DRIVER_MEM),
full setup fill, then the ENTIRE declared surface timed --runs times
in one session — run 1 pays scan/JIT/AQE first-touch, the LAST run is
the steady-state measurement (the r10 recheck discipline that cleared
text_hashing_vectorizer's 1.39 cold outlier to 0.90).

The JSON is rewritten after every run (and every 25 keys inside a
run), so a crashed or killed leg still leaves usable partial evidence.

Usage:
  SPARK_GRAFT_DRIVER_MEM=48g python tools/full_probe_leg.py \
      --sf-dir /tmp/dgdb_sf1 --runs 2 --out PROBE_LEG_SF1.json

Combine two legs with tools/full_probe_combine.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dump(out_path: str, payload: dict) -> None:
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, out_path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", required=True)
    ap.add_argument("--keys", nargs="*", default=None)
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entry_mod
    from distributed_graph_database_spark.session import get_spark

    spark = get_spark("dgdb-full-probe-leg")
    spark.sparkContext.setLogLevel("ERROR")

    keys = args.keys or list(entry_mod.queries())
    queries = entry_mod.queries()

    payload: dict = {
        "sf_dir": args.sf_dir,
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "n_keys": len(keys),
        "runs": [],
        "setup": None,
    }

    bench.warm_up(spark)
    t0 = time.perf_counter()
    payload["setup"] = bench.run_setup(spark, args.sf_dir)
    payload["setup_total_s"] = round(time.perf_counter() - t0, 1)
    _dump(args.out, payload)
    print(
        f"setup done: {payload['setup_total_s']} s "
        f"({len(payload['setup'])} items)",
        file=sys.stderr,
    )

    for run_ix in range(args.runs):
        timings: dict[str, float] = {}
        failures: dict[str, str] = {}
        rec = {"timings": timings, "failures": failures, "total_s": None}
        payload["runs"].append(rec)
        r0 = time.perf_counter()
        for i, key in enumerate(keys):
            k0 = time.perf_counter()
            try:
                bench._materialize(queries[key](spark, args.sf_dir))
                timings[key] = round(time.perf_counter() - k0, 4)
            except Exception as exc:  # one broken key must not sink the leg
                failures[key] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"leg: {key} FAILED: {failures[key]}", file=sys.stderr)
            if (i + 1) % 25 == 0:
                rec["total_s"] = round(time.perf_counter() - r0, 1)
                _dump(args.out, payload)
                print(
                    f"run {run_ix + 1}: {i + 1}/{len(keys)} keys, "
                    f"{rec['total_s']} s elapsed",
                    file=sys.stderr,
                )
        rec["total_s"] = round(time.perf_counter() - r0, 1)
        _dump(args.out, payload)
        print(
            f"run {run_ix + 1} done: {len(timings)} keys, "
            f"{rec['total_s']} s, {len(failures)} failures",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
