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


def test_q2_correlated_min_decorrelates(spark, sf_oracle):
    """The per-part MIN over the region-filtered partsupp must become
    one grouped aggregate equi-joined back on (cost, partkey) — never
    a nested-loop per-part re-execution."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q2)
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "min(ps_supplycost_cents)" in p


def test_q9_five_relation_join_broadcasts_dims(spark, sf_oracle):
    """part/supplier/nation broadcast; only the two fact tables may
    shuffle — and nothing degrades to a cartesian."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q9)
    assert "Cartesian" not in p
    assert p.count("BroadcastExchange") >= 3


def test_q11_having_threshold_is_subqueries_not_rescan_joins(spark, sf_oracle):
    """The two whole-CTE aggregates (count, sum) feed the HAVING as
    scalar subqueries — one-row broadcast plans, not joins against a
    re-scanned natsupp."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q11)
    assert "Cartesian" not in p
    assert p.count("Subquery subquery#") >= 2


def test_q12_date_window_reaches_the_lineitem_scan(spark, sf_oracle):
    """The 1996 ship-date range must push to the parquet scan; the
    cross-table lag predicate stays a residual on the join."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q12)
    scans = p.split("FileScan parquet")
    assert any(
        "l_shipdate" in s.split("ReadSchema")[0] and "PushedFilters: [" in s
        and "1996-01-01" in s.split("ReadSchema")[0]
        for s in scans[1:]
    )


def test_q16_not_in_plans_null_aware_anti_join(spark, sf_oracle):
    """NOT IN over the blacklisted suppliers compiles to a (null-aware)
    LeftAnti broadcast join — never a filter re-scanning supplier per
    row."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q16)
    assert "LeftAnti" in p


def test_q20_nested_in_and_correlated_sum_decorrelate(spark, sf_oracle):
    """Both IN subqueries become LeftSemi joins and the correlated
    1997-window SUM becomes a grouped aggregate equi-joined on
    (partkey, suppkey) — three nesting levels, zero nested loops."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q20)
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "LeftSemi" in p


def test_q21_exists_pair_is_semi_plus_anti_self_join(spark, sf_oracle):
    """The EXISTS/NOT-EXISTS pair over lineitem must plan as a
    LeftSemi AND a LeftAnti self-join on l_orderkey, with the non-equi
    lateness term as a residual join condition."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q21)
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_q22_windowed_not_exists_is_anti_join_with_pushed_date(spark, sf_oracle):
    """The recency NOT EXISTS plans as a LeftAnti against orders with
    the 2000-01-01 date filter pushed into the orders scan — the
    anti-join side reads only the window, not order history."""
    p = _plan(spark, sf_oracle, relational.ql_sql_q22)
    assert "LeftAnti" in p
    scans = p.split("FileScan parquet")
    orders_scans = [s for s in scans[1:] if "o_orderdate" in s.split("ReadSchema")[0]]
    assert any("2000-01-01" in s.split("ReadSchema")[0] for s in orders_scans)
