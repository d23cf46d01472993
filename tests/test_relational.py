"""Relational backbone: plan-shape checks (the 100 TB story) and the
approximate-distinct accuracy bound. Value correctness is covered by
test_oracle_parity.py for every hash-checkable key."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark import relational


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_distinct_audit_verdict(spark, sf_oracle):
    """The graduated audit form (r10): the declared row carries the
    exact count plus the signed within-5% verdict, and the underlying
    sketch really is within tolerance when measured directly."""
    row = relational.ql_approx_distinct(spark, sf_oracle).first()
    exact = (
        relational.table(spark, sf_oracle, "orders")
        .agg(F.countDistinct("o_custkey"))
        .first()[0]
    )
    assert row.n_exact == exact
    assert row.approx_ok
    approx = (
        relational.table(spark, sf_oracle, "orders")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02))
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


def test_sql_q10_window_is_nonvacuous(spark, sf_oracle):
    """The Q10 date window must actually select data in the driver
    testdata (a regenerated date range that empties the filter would
    make the hash check vacuously green — the store_sorted_prune
    lesson, r4)."""
    rows = relational.ql_sql_q10(spark, sf_oracle).collect()
    assert len(rows) == 20  # LIMIT 20 out of a non-empty window
    assert all(r.revenue_cents > 0 for r in rows)


def test_window_misc_values_are_consistent(spark, sf_oracle):
    """ntile/percent_rank/cume_dist sanity on one partition: quartiles
    cover 1..4, pct_rank spans [0, 1], cume_dist is non-decreasing in
    cents order, and lag/lead mirror neighbors."""
    rows = [
        r
        for r in relational.ql_window_misc(spark, sf_oracle).collect()
        if r.o_orderpriority == "1-URGENT"
    ]
    rows.sort(key=lambda r: (r.cents, r.o_orderkey))
    assert rows and {r.quartile for r in rows} == {1, 2, 3, 4}
    assert rows[0].pct_rank == 0.0 and rows[-1].pct_rank == 1.0
    assert rows[-1].cume == 1.0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.cume >= prev.cume
        assert cur.prev_cents == prev.cents
        assert prev.next_cents == cur.cents


def test_eqdepth_histogram_masses_are_balanced(spark, sf_oracle):
    """Equi-depth law: every bucket holds ~n/16 rows — deviations only
    from value-tie mass at boundaries (ties go left). On the order
    totals (near-unique cents) the spread must stay tight, and bucket
    ids must be exactly 0..15 with min/max ranges non-overlapping in
    order."""
    from distributed_graph_database_spark.relational import (
        EQDEPTH_BINS,
        ql_histogram_eqdepth,
    )

    rows = sorted(
        ql_histogram_eqdepth(spark, sf_oracle).collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in rows] == list(range(EQDEPTH_BINS))
    n = sum(r.n_orders for r in rows)
    target = n / EQDEPTH_BINS
    for r in rows:
        assert abs(r.n_orders - target) <= max(2, 0.02 * target), r
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents


def test_regr_bigint_moment_headroom(spark, sf_oracle):
    """ql_regr accumulates its moment sums in bigint (VERDICT r8 item
    3); this pins the width budget to the TPC-H generator bounds so a
    future data change can't silently wrap the int64 accumulator.
    Bounds: quantity ∈ [1, 50], extendedprice < 110 000.00 → cents
    y < 1.1e7; the largest per-group sum is Σxy ≤ n·50·1.1e7. The
    declared headroom claim is ≥600× the sf1 row count."""
    X_MAX = 50
    Y_MAX_CENTS = 11_000_000
    SF1_LINEITEM_ROWS = 6_001_215
    INT64_MAX = 2**63 - 1
    per_row_xy = X_MAX * Y_MAX_CENTS
    assert INT64_MAX // per_row_xy >= 600 * SF1_LINEITEM_ROWS

    # And the live data actually honors the pinned bounds.
    from pyspark.sql import functions as F
    from distributed_graph_database_spark.catalog import table

    li = table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.max("l_quantity").alias("mx"),
        F.max("l_extendedprice").alias("my"),
    ).collect()[0]
    assert row.mx <= X_MAX and round(row.my * 100) <= Y_MAX_CENTS

    # The aggregate itself must be bigint-side (no per-row decimal
    # multiplies): the partial-aggregate schema carries no decimal.
    from distributed_graph_database_spark.relational import ql_regr

    plan = ql_regr(spark, sf_oracle)._jdf.queryExecution().executedPlan().toString()
    agg_lines = [
        ln for ln in plan.splitlines() if "partial" in ln.lower() and "sum" in ln.lower()
    ]
    assert agg_lines, plan
    assert all("Decimal" not in ln and "decimal" not in ln for ln in agg_lines), agg_lines


def test_regr_overflow_guard_fails_loudly(spark, tmp_path):
    """ADVICE r9 #2: the bigint moment sums rely on a static width
    budget; a SUM past it must raise — never return wrong slopes. In
    an ANSI session (Spark 4 default) the overflowing sum itself
    raises ARITHMETIC_OVERFLOW; in a non-ANSI session the sum wraps
    silently, and ql_regr's own runtime guard (n · max per-row term ≤
    int64 max, computed in decimal) fires instead. Both paths are
    exercised here."""
    import pytest

    from distributed_graph_database_spark.relational import ql_regr

    # 3 rows × (x·y = 4e18) → Σxy = 1.2e19 > 2^63−1: the sum genuinely
    # overflows, and n·max_term breaches the guard bound.
    spark.createDataFrame(
        [("F", 1.0, 4.0e16)] * 3,
        "l_linestatus string, l_quantity double, l_extendedprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|int64 headroom"):
        ql_regr(spark, str(tmp_path)).collect()

    # The non-ANSI path: the sums wrap silently, so the result would
    # be wrong without the guard — the guard must be what raises.
    prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="int64 headroom"):
            ql_regr(spark, str(tmp_path)).collect()

        # The r10 review's bypass scenario: a SINGLE row whose per-row
        # product wraps (x·y = 1.2e19) while n·max_term would still
        # look in-budget — the guard's max_in² condition must catch it.
        spark.createDataFrame(
            [("F", 3.0, 4.0e16), ("F", 1.0, 1.0)],
            "l_linestatus string, l_quantity double, l_extendedprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        with pytest.raises(Exception, match="int64 headroom"):
            ql_regr(spark, str(tmp_path)).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)


def test_regr_overflow_guard_passes_real_data(spark, sf_oracle):
    """The guard is invisible on in-budget data: one result row per
    linestatus group, none swallowed."""
    from distributed_graph_database_spark.catalog import table
    from distributed_graph_database_spark.relational import ql_regr

    n_groups = (
        table(spark, sf_oracle, "lineitem").select("l_linestatus").distinct().count()
    )
    assert ql_regr(spark, sf_oracle).count() == n_groups


def test_regr_overflow_guard_negative_and_saturation_paths(spark, tmp_path):
    """r10 second-review scenarios: (a) a large NEGATIVE moment sum
    (wraps below int64 min — an upper-only bound would pass it) and
    (b) a double→bigint cast saturated to Long.MIN (whose abs() wraps
    negative and would hide from the maxima) must both fail loudly in
    non-ANSI mode."""
    import pytest

    from distributed_graph_database_spark.relational import ql_regr

    prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        # (a) x=-2, y=4e18 per row → per-row x·y=-8e18 exact, but
        # Σxy over 3 rows = -2.4e19 < int64 min
        spark.createDataFrame(
            [("F", -2.0, 4.0e16)] * 3,
            "l_linestatus string, l_quantity double, l_extendedprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        with pytest.raises(Exception, match="int64 headroom"):
            ql_regr(spark, str(tmp_path)).collect()

        # (b) extendedprice so negative the cents cast saturates to
        # Long.MIN; a second benign row keeps the maxima small
        spark.createDataFrame(
            [("F", 1.0, -1.0e18), ("F", 1.0, 1.0)],
            "l_linestatus string, l_quantity double, l_extendedprice double",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        with pytest.raises(Exception, match="int64 headroom"):
            ql_regr(spark, str(tmp_path)).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)
