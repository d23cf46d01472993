"""Runtime bloom-filter join pruning: the automatic complement to the
DECLARED pruning keys (store_partition_prune / store_sorted_prune,
sources/formats.py) and to dynamic partition pruning — Spark injects a
bloom filter built from the SELECTIVE side of a join into the scan of
the LARGE side, so fact rows that cannot possibly match are dropped at
the scan, before the shuffle.

At 100 TB this is the difference between shuffling the whole fact
table and shuffling only the ~matching fraction: a filtered dimension
(here: urgent orders) produces a compact bloom sketch; the fact scan
evaluates might_contain(xxhash64(key)) per row — no query rewrite, no
manual semi-join staging. The production defaults (creation side
≤ 10 MB post-filter, application side ≥ 10 GB scan) are sized for real
clusters; this test lowers only the application-side threshold so a
60k-row fixture exercises the machinery, and pins that the filter
actually reaches the plan: a bloom_filter_agg on the creation side and
a might_contain predicate on the fact scan's Filter.
"""

from __future__ import annotations

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the filtered orders side easily clears the 10 MB creation cap;
    # the fact side must look "large" to be worth filtering — at test
    # scale that means dropping the 10 GB application-side floor
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force a shuffle join: under a broadcast the filter is moot (the
    # build side ships whole anyway) and Spark rightly skips injection
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_runtime_bloom_filter_reaches_the_fact_scan(spark, sf_oracle):
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{sf_oracle}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        lineitem = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        q = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "creation side: no bloom sketch built"
        assert "might_contain" in plan, "application side: scan not filtered"
        # and the filtered result is still correct
        rows = q.collect()
        assert len(rows) == 1 and rows[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
