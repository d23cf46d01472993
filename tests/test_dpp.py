"""Dynamic partition pruning: the RUNTIME complement of
store_partition_prune's static pruning — when the partition-column
filter lives on the DIMENSION side of a join, Spark injects the dim's
filtered key set into the fact scan as a dynamicpruning subquery, so
only the matching partition directories are listed and read.

At 100 TB this is what keeps `fact JOIN dim WHERE dim.attr = x`
from scanning every partition of the fact: the fact-side predicate
doesn't exist statically — it is DERIVED at runtime from the dim
filter (here reusing the join's own broadcast). The test pins that
the injected filter actually lands on the partitioned scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark.sources import formats as fm


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, sf_oracle):
    fact_dir = fm._partitioned_dir(spark, sf_oracle)  # documents by lang
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("en", "keep"), ("de", "keep"), ("fr", "drop"),
         ("es", "drop"), ("zh", "drop")],
        "lang string, disposition string",
    ).filter(F.col("disposition") == "keep")
    q = fact.join(dim, "lang").groupBy("lang").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "no runtime partition filter injected"
    # and the result only covers the dim-selected partitions
    langs = {r["lang"] for r in q.collect()}
    assert langs == {"en", "de"}
