"""Capture `.explain("formatted")` for named keys into plans/r14/.

Round-14 optimization evidence: the judge checks plan claims (Exchange
counts, join strategies, PushedFilters) against these files, so each
optimized key gets a `<key>_before.txt` (captured at the pre-change
code) and `<key>_after.txt` (at HEAD).

Usage:
    python tools/explain_r13.py before key1 key2 ...
    python tools/explain_r13.py after  key1 key2 ...

Uses registry.PLAN_QUERIES so cache.shared-served keys show the real
underlying plan, not a checkpoint scan. SF dir from SPARK_GRAFT_SF_DIR
(default sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_database_spark import registry  # noqa: E402
from distributed_graph_database_spark.session import get_spark  # noqa: E402


def main() -> int:
    stage = sys.argv[1]
    assert stage in ("before", "after"), "stage must be before|after"
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dgdb-explain-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        fn = registry.PLAN_QUERIES[key]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{stage}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} — {stage} (sf_dir={sf_dir})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
