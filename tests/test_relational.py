"""Relational backbone: plan-shape checks (the 100 TB story) and the
approximate-distinct accuracy bound. Value correctness is covered by
test_oracle_parity.py for every hash-checkable key."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark import relational


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_distinct_within_5pct(spark, sf_oracle):
    approx = relational.ql_approx_distinct(spark, sf_oracle).first()[0]
    exact = (
        relational.table(spark, sf_oracle, "orders")
        .agg(F.countDistinct("o_custkey"))
        .first()[0]
    )
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_broadcast_join_plan_broadcasts(spark, sf_oracle):
    plan = _physical_plan(relational.ql_broadcast_join(spark, sf_oracle))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_oracle):
    plan = _physical_plan(relational.ql_filter(spark, sf_oracle))
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:300], plan


def test_scan_project_prunes_columns(spark, sf_oracle):
    plan = _physical_plan(relational.ql_scan_project(spark, sf_oracle))
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" not in read_schema, read_schema
    assert "l_shipdate" in read_schema, read_schema


def test_topk_avoids_global_sort(spark, sf_oracle):
    plan = _physical_plan(relational.ql_topk(spark, sf_oracle))
    assert "TakeOrderedAndProject" in plan, plan


def test_bucketed_join_has_no_shuffle(spark, sf_oracle):
    """The whole point of bucketing: bucket k joins bucket k directly —
    no Exchange under the sort-merge join, and the bucketed scans
    report the bucket count."""
    plan = _physical_plan(relational.ql_bucketed_join(spark, sf_oracle))
    join_subtree = plan.split("SortMergeJoin")[1]
    # exchanges may exist above the join (the groupBy), never below it
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in join_subtree.split("Scan")[0], plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_semi_anti_use_semi_join_plans(spark, sf_oracle):
    plan = _physical_plan(relational.ql_semi_anti_join(spark, sf_oracle))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
