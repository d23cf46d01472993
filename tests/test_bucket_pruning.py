"""Bucket pruning: a point lookup on the bucket key must scan ONE
bucket of the bucketed table, not all of them — the read-side payoff
of bucketBy beyond the exchange-free join (test_tpch_plans pins that
one). At 100 TB this is an O(1/N)-of-the-table point lookup with no
index structure: hash(key) names the only bucket files that can
contain the row.

autoBucketedScan is disabled inside the test because Spark otherwise
rewrites lone-scan plans to ignore bucketing (it only keeps bucketed
reads where joins/aggs use the distribution) — the pruning machinery
is what's being pinned, and `SelectedBucketsCount: 1 out of N` is its
plan marker."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from distributed_graph_database_spark import relational


def test_point_lookup_scans_one_bucket(spark, sf_oracle):
    saved = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    try:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        _, tl = relational._bucketed_pair(spark, sf_oracle)
        q = (
            spark.table(tl)
            .filter(F.col("l_orderkey") == 7)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, "no bucket pruning marker in plan"
        assert int(m.group(1)) == 1 and int(m.group(2)) > 1
        assert q.first()["n"] > 0  # the looked-up order exists
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
