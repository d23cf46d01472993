"""Combine two full_probe_leg.py legs into the full-surface
second-decade report (VERDICT r12 next #2): per-key steady-state
exponent = log(t_big/t_small)/log(ratio) using each leg's LAST run
(run 1 pays first-touch; the last run is steady state), plus the
cold (run-1) exponent so first-touch outliers are visible next to
their steady-state disposition.

Usage:
  python tools/full_probe_combine.py --small PROBE_LEG_SF1.json \
      --big PROBE_LEG_SF10.json --ratio 10 \
      --out SCALE_PROBE_SF10_FULL.json
"""

from __future__ import annotations

import argparse
import json
import math


def _exp(t_small, t_big, ratio: float):
    if t_small is None or t_big is None:
        return None
    return round(
        math.log(max(t_big, 1e-4) / max(t_small, 1e-4)) / math.log(ratio), 3
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", required=True)
    ap.add_argument("--big", required=True)
    ap.add_argument("--ratio", type=float, default=10.0)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--threshold", type=float, default=1.1,
        help="steady-state exponent above which a key is flagged",
    )
    args = ap.parse_args()

    small = json.load(open(args.small))
    big = json.load(open(args.big))

    def runs(leg):
        return [r["timings"] for r in leg["runs"] if r["timings"]]

    s_runs, b_runs = runs(small), runs(big)
    s_steady, b_steady = s_runs[-1], b_runs[-1]
    s_cold, b_cold = s_runs[0], b_runs[0]

    keys = sorted(set(s_steady) | set(b_steady))
    report = {}
    flagged = []
    for k in keys:
        ts, tb = s_steady.get(k), b_steady.get(k)
        e = _exp(ts, tb, args.ratio)
        rec = {
            "t_small": ts,
            "t_big": tb,
            "exponent": e,
            "exponent_cold": _exp(s_cold.get(k), b_cold.get(k), args.ratio),
        }
        report[k] = rec
        if e is not None and e > args.threshold:
            flagged.append(k)

    out = {
        "ratio": args.ratio,
        "threshold": args.threshold,
        "methodology": (
            "fresh process per leg, 48g heap, full setup fill, "
            f"{len(s_runs)}/{len(b_runs)} runs per leg; steady = last run"
        ),
        "legs": {
            "small": {"sf_dir": small["sf_dir"], "setup": small["setup"],
                      "run_totals_s": [r["total_s"] for r in small["runs"]],
                      "failures": small["runs"][-1]["failures"]},
            "big": {"sf_dir": big["sf_dir"], "setup": big["setup"],
                    "run_totals_s": [r["total_s"] for r in big["runs"]],
                    "failures": big["runs"][-1]["failures"]},
        },
        "setup_exponents": {
            item: _exp(small["setup"].get(item), big["setup"].get(item),
                       args.ratio)
            for item in small.get("setup", {})
        },
        "n_keys": len(keys),
        "flagged_over_threshold": flagged,
        "keys": report,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")

    worst = sorted(
        (kv for kv in report.items() if kv[1]["exponent"] is not None),
        key=lambda kv: -kv[1]["exponent"],
    )[:25]
    for k, v in worst:
        print(f"{k:30s} {v['t_small']:8.3f} -> {v['t_big']:9.3f}"
              f"  exp {v['exponent']}  (cold {v['exponent_cold']})")
    print(f"\n{len(keys)} keys; {len(flagged)} over {args.threshold}: "
          f"{flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
