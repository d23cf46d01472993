"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine package: the declared query surface
lives in ``distributed_graph_database_spark.registry`` (Spark side)
and ``distributed_graph_database_spark.oracles`` (DuckDB side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_graph_database_spark import oracles, registry
from distributed_graph_database_spark.graph import derive, traversal

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BFS levels over the customer–order graph derived
    from sf0.001 orders (SURVEY.md §7.1 P1). Driver checks rows > 0.
    """
    edges = derive.derived_edges_sym(spark, SMOKE_SF_DIR)
    start = derive.default_start(spark, SMOKE_SF_DIR)
    return traversal.bfs_levels(spark, edges, start)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each hash-checkable key; keys omitted here get
    the driver's weaker rows-only check (approximate/streaming ops).
    """
    return dict(oracles.ORACLE_SQL)
