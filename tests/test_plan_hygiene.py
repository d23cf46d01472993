"""Global physical-plan hygiene across the whole declared surface.

Two anti-patterns are banned engine-wide (the 100 TB contract):
- `CartesianProduct` — a shuffle cartesian means some blocked/bucketed
  join degenerated to all-pairs. (BroadcastNestedLoopJoin is allowed:
  the deliberate tiny-side patterns — pinned query sets, centroid
  grids — use it by design.)
- `BatchEvalPython` / `ArrowEvalPython` — row-at-a-time or scalar
  Python UDFs in a query plan. The only sanctioned Python is the
  Arrow-batched mapInPandas kernels (`MapInPandas` nodes).
"""

from __future__ import annotations

import pytest

from distributed_graph_database_spark import registry

KEYS = sorted(registry.PLAN_QUERIES)


@pytest.mark.parametrize("key", KEYS)
def test_no_cartesian_no_python_udf(spark, sf_oracle, key):
    df = registry.PLAN_QUERIES[key](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{key}: shuffle cartesian\n{plan}"
    assert "BatchEvalPython" not in plan, f"{key}: row Python UDF\n{plan}"
    assert "ArrowEvalPython" not in plan, f"{key}: scalar Python UDF\n{plan}"
