"""Z-order layout: prove the Morton curve actually buys
multi-dimensional file locality — the measurable claim behind
store_zorder_prune's docstring, not just result parity.

File-level locality is measured as "how many files contain matching
rows" (input_file_name distinct) — the layout property min/max
skipping exploits: a file with no matching rows has a min/max span
excluding the predicate and is pruned at the footer.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_graph_database_spark.sources import formats as fm


def _n_files(d: str) -> int:
    return len([f for f in os.listdir(d) if f.startswith("part-")])


def _touched(spark, d: str, pred) -> int:
    return (
        spark.read.parquet(d)
        .filter(pred)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zvalue_is_bit_interleave(spark):
    """x=0b101, y=0b011 → z = 0b011011 = 27 (x even bits, y odd)."""
    row = (
        spark.range(1)
        .select(fm._zvalue(F.lit(5).cast("bigint"), F.lit(3).cast("bigint")).alias("z"))
        .first()
    )
    assert row["z"] == 27


def test_zorder_rectangle_confines_matches_to_few_files(spark, sf_oracle):
    """The 2-D query window (20% of custkeys × ~7% of dates) must land
    in a small corner of the curve — at most a quarter of the files."""
    d = fm._zorder_dir(spark, sf_oracle)
    pred = (
        (F.col("o_custkey") >= fm.ZORDER_CUST_FROM)
        & (F.col("o_custkey") < fm.ZORDER_CUST_TO)
        & (F.col("o_orderdate") >= fm.ZORDER_DATE_FROM)
        & (F.col("o_orderdate") < fm.ZORDER_DATE_TO)
    )
    total = _n_files(d)
    assert total == fm.ZORDER_FILES
    assert _touched(spark, d, pred) <= total // 4


def test_zorder_clusters_the_dimension_a_single_sort_scatters(spark, sf_oracle):
    """A custkey-only filter: the date-sorted layout has NO custkey
    locality (every file matches), the Z layout does (a strict subset
    of files matches) — the whole point of interleaving."""
    pred = (F.col("o_custkey") >= fm.ZORDER_CUST_FROM) & (
        F.col("o_custkey") < fm.ZORDER_CUST_TO
    )
    sd = fm._sorted_dir(spark, sf_oracle)
    assert _touched(spark, sd, pred) == _n_files(sd)
    zd = fm._zorder_dir(spark, sf_oracle)
    assert _touched(spark, zd, pred) < _n_files(zd)
