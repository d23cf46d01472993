"""Positive plan-shape assertions for the TPC-H front doors: each
query's string must compile to the physical plan its docstring
promises — decorrelated subqueries, preserved outer joins, extracted
equi-keys, pushed-down scan filters. The negative bans (cartesian,
Python eval) live in test_plan_hygiene; these pin the positive shape."""

from __future__ import annotations

from distributed_graph_database_spark import relational


def _plan(spark, sf_oracle, fn) -> str:
    return fn(spark, sf_oracle)._jdf.queryExecution().executedPlan().toString()


def test_q17_scalar_subquery_decorrelates(spark, sf_oracle):
    """The per-part AVG must become one grouped aggregate joined back
    — never a nested-loop re-execution per outer row."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q17)
    assert "NestedLoop" not in p
    assert p.count("HashAggregate(keys=[l_partkey") >= 1 or "avg(l_quantity" in p


def test_q13_left_join_survives_the_join_condition_filter(spark, sf_oracle):
    """The priority exclusion sits in the JOIN condition; the planner
    must keep the join LeftOuter (pushing it to a WHERE would drop
    zero-order customers)."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q13)
    assert "LeftOuter" in p


def test_q19_disjunction_keeps_the_equi_key(spark, sf_oracle):
    """Three OR'd arms must not defeat equi-join extraction: the plan
    joins on p_partkey = l_partkey with the OR as a residual, never a
    cartesian."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q19)
    assert "Cartesian" not in p
    assert ("BroadcastHashJoin [l_partkey" in p) or ("SortMergeJoin [l_partkey" in p) \
        or ("BroadcastHashJoin [p_partkey" in p) or ("ShuffledHashJoin" in p)


def test_q8_broadcasts_dims_no_cartesian(spark, sf_oracle):
    """Eight relations from a bare comma-join: every dimension side
    broadcasts (nation twice), and nothing degrades to a cartesian."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q8)
    assert "Cartesian" not in p
    assert p.count("BroadcastExchange") >= 4


def test_q6_predicates_reach_the_scan(spark, sf_oracle):
    """All three Q6 predicates must appear as pushed scan filters so
    row groups prune on shipdate min/max."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q6)
    assert "PushedFilters: [" in p
    scan = p[p.index("FileScan parquet"):]
    assert "l_shipdate" in scan.split("ReadSchema")[0]


def test_q15_cte_max_is_a_subquery_not_a_rescan_cartesian(spark, sf_oracle):
    """The scalar MAX over the CTE compiles to a subquery/reused
    aggregate — and the join back to supplier stays an equi hash
    join."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q15)
    assert "Cartesian" not in p
    assert "Join" in p
