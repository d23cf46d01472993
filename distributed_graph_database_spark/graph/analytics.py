"""Graph analytics derived from the relational tables — the operators
a graph engine grows once traversal works: bipartite projection and
triangle counting. The reference's graphs are tiny matrix files
(SURVEY.md §1); these keys exercise the same edge-table machinery on
the TPC-H-ish side of the testdata, where the graph is implied by
foreign keys (parts co-occurring in an order).

Scale notes (the point of each shape):
- `graph_copurchase` projects the lineitem (order, part) bipartite
  graph onto parts. The quadratic term is per-order basket size —
  bounded by the schema (TPC-H orders have ≤ 7 lineitems); at corpus
  scale the standard guard is a basket-size cap, the exact analogue
  of dedup_ngram's stop-shingle df cap.
- `graph_triangles` counts triangles with DEGREE-ORIENTED edges
  (each undirected edge directed from its (degree, id)-smaller
  endpoint): wedge work is Σ out-deg² where out-degree is bounded by
  ~√m after orientation — O(m^1.5) total, the classic
  compact-forward bound — instead of Σ deg² on raw adjacency, which
  dies on hub vertices. Both sides (Spark and the DuckDB oracle)
  compute the identical orientation, so the count is exact-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

# Support threshold: a pair must co-occur in at least this many orders
# to become an edge. Co-occurrence of 1 is sampling noise in a basket
# graph (measured: the raw sf0.1 projection has 1.2M noise edges vs
# 3.6k support-2 edges) and the cut is what keeps the projected graph
# O(#true affinities) rather than O(Σ basket²) at corpus scale — the
# market-basket analogue of dedup_ngram's stop-shingle df cap.
COPURCHASE_MIN_ORDERS = 2


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs (p1 < p2) co-occurring in ≥ COPURCHASE_MIN_ORDERS
    orders, with the co-occurrence count: (p1, p2, n_orders)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= COPURCHASE_MIN_ORDERS)
    )


def graph_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _copurchase_edges(spark, sf_dir)


ORACLE_GRAPH_COPURCHASE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= {COPURCHASE_MIN_ORDERS}
"""


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the co-purchase graph → one row
    (n_triangles). Compact-forward enumeration: edges oriented from
    the (degree, id)-smaller endpoint, wedges joined on the middle
    vertex, closed by an equi-join on the (a, c) edge — three hash
    joins, no wedge ever materialized for a hub's full neighborhood."""
    e = _copurchase_edges(spark, sf_dir).select("p1", "p2").localCheckpoint(eager=True)
    deg = (
        e.select(F.col("p1").alias("v"))
        .unionAll(e.select(F.col("p2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("p1"), F.col("d").alias("d1"))
    db = deg.select(F.col("v").alias("p2"), F.col("d").alias("d2"))
    with_deg = e.join(da, "p1").join(db, "p2")
    fwd = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    o = with_deg.select(
        F.when(fwd, F.col("p1")).otherwise(F.col("p2")).alias("a"),
        F.when(fwd, F.col("p2")).otherwise(F.col("p1")).alias("b"),
    ).localCheckpoint(eager=True)
    o1 = o.select(F.col("a"), F.col("b"))
    o2 = o.select(F.col("a").alias("b"), F.col("b").alias("c"))
    o3 = o.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    wedges = o1.join(o2, "b")
    return (
        wedges.join(
            o3,
            (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


ORACLE_GRAPH_TRIANGLES = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {COPURCHASE_MIN_ORDERS}
),
deg AS (
  SELECT v, COUNT(*) AS d
  FROM (SELECT p1 AS v FROM e UNION ALL SELECT p2 AS v FROM e)
  GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.p1 < e.p2)
              THEN e.p1 ELSE e.p2 END AS a,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.p1 < e.p2)
              THEN e.p2 ELSE e.p1 END AS b
  FROM e JOIN deg da ON e.p1 = da.v JOIN deg db ON e.p2 = db.v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM o o1
JOIN o o2 ON o1.b = o2.a
WHERE EXISTS (SELECT 1 FROM o o3 WHERE o3.a = o1.a AND o3.b = o2.b)
"""


QUERIES = {
    "graph_copurchase": graph_copurchase,
    "graph_triangles": graph_triangles,
}

ORACLE_SQL = {
    "graph_copurchase": ORACLE_GRAPH_COPURCHASE,
    "graph_triangles": ORACLE_GRAPH_TRIANGLES,
}
