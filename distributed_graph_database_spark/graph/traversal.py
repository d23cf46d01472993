"""Iterative graph traversal — the engine's one genuinely custom operator.

Reference semantics being re-expressed (SURVEY.md §2.1):
- R5 BFS (dfs_bfs.h:111-172): level-order traversal; levels serial,
  within-level unordered (thread-race order). Spark restatement:
  level(v) = min hops from start; canonical order (level, vid).
- R4 DFS (dfs_bfs.h:42-90): output = terminal vertices of the
  traversal tree (vertices that had no unvisited neighbor when
  reached). Deterministic refinement (SURVEY.md §7.3): traversal tree
  = BFS tree with parent(v) = min-vid neighbor at level(v)-1; leaves
  = reachable vertices with no child in that tree. Equals the
  reference's path-terminal set on forests (its guaranteed input
  class, Assignment 2.pdf p.4).
- R6 visited-set dedup (dfs_bfs.h:48,100-105) becomes per-round
  left_anti set algebra, not a mutable bitmap.
- R7 frontier queue (dfs_bfs.h:102-104,126-135): the per-round join
  result IS the next frontier.

Physical shape at scale (SURVEY.md §4.4): each BFS round is one
`frontier ⋈ edges` stage — the reference's per-level thread barrier
(dfs_bfs.h:143-160) maps to Spark's per-round shuffle/stage boundary.
The frontier is broadcast while small (no shuffle of the big edge
side at all); `visited` accumulates and is localCheckpoint-ed every
round to truncate lineage (the GraphX iterative pattern, OSDI'14).
Edges are cached once so 100 TB of parquet isn't re-scanned per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Broadcast the frontier while below this many rows; beyond it, fall
# back to a shuffle join (AQE may still convert at runtime). At 100 TB
# a frontier can be billions of rows — never unconditionally broadcast.
BROADCAST_FRONTIER_MAX_ROWS = 5_000_000

MAX_LEVELS_DEFAULT = 100


def bfs_levels(
    spark: SparkSession,
    edges_sym: DataFrame,
    start: int,
    max_levels: int = MAX_LEVELS_DEFAULT,
    cache_edges: bool = True,
) -> DataFrame:
    """Minimum-hop level per reachable vertex → (vid bigint, level int).

    Driver-side loop of DataFrame ops; every round's result is
    localCheckpoint-ed (eager) so lineage stays O(1) and the round
    count doubles as the termination check.
    """
    if cache_edges:
        edges_sym = edges_sym.persist()

    visited = spark.createDataFrame([(start, 0)], "vid bigint, level int")
    visited = visited.localCheckpoint(eager=True)
    frontier = visited.select("vid")
    frontier_rows = 1

    level = 0
    while level < max_levels:
        level += 1
        probe = (
            F.broadcast(frontier)
            if frontier_rows <= BROADCAST_FRONTIER_MAX_ROWS
            else frontier
        )
        nxt = (
            probe.join(edges_sym, probe.vid == edges_sym.src)
            .select(F.col("dst").alias("vid"))
            .distinct()
            .join(visited, "vid", "left_anti")
            .withColumn("level", F.lit(level).cast("int"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        frontier_rows = nxt.count()
        if frontier_rows == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("vid")

    if cache_edges:
        edges_sym.unpersist()
    return visited


def reachable_vertices(
    spark: SparkSession, edges_sym: DataFrame, start: int, **kw
) -> DataFrame:
    """Transitive closure from start (R4/R5 common core) → (vid)."""
    return bfs_levels(spark, edges_sym, start, **kw).select("vid")


def bfs_order(spark: SparkSession, edges_sym: DataFrame, start: int, **kw) -> DataFrame:
    """R5+R9: traversal output as one space-separated string, canonical
    order (level, vid). The reference's formatter (secondary_server.c:
    223-226) corrupted 2-digit ids — ours is correct for any id
    (SURVEY.md §4.3). array_sort over collected structs keeps the
    result deterministic regardless of partitioning.
    """
    lv = bfs_levels(spark, edges_sym, start, **kw)
    return lv.agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("level", "vid"))),
                lambda s: s.vid.cast("string"),
            ),
            " ",
        ).alias("bfs_order")
    )


def bfs_tree(
    spark: SparkSession, edges_sym: DataFrame, start: int, **kw
) -> DataFrame:
    """Deterministic traversal tree: (vid, level, parent) with
    parent(v) = min-vid neighbor of v at level(v)-1 (start has none).
    """
    lv = bfs_levels(spark, edges_sym, start, **kw)
    child = lv.alias("c")
    parent = lv.alias("p")
    e = edges_sym.alias("e")
    tree = (
        child.join(e, F.col("c.vid") == F.col("e.dst"))
        .join(
            parent,
            (F.col("e.src") == F.col("p.vid"))
            & (F.col("p.level") == F.col("c.level") - F.lit(1)),
        )
        .groupBy(F.col("c.vid").alias("vid"), F.col("c.level").alias("level"))
        .agg(F.min(F.col("e.src")).alias("parent"))
    )
    root = lv.filter(F.col("level") == 0).select(
        "vid", "level", F.lit(None).cast("bigint").alias("parent")
    )
    return root.unionByName(tree)


def dfs_leaves(spark: SparkSession, edges_sym: DataFrame, start: int, **kw) -> DataFrame:
    """R4 terminal-vertex set (dfs_bfs.h:71-77 `!tidx` test): reachable
    vertices that parent no one in the deterministic traversal tree.
    A start with no neighbors is its own terminal (FIXTURES.md G6).
    """
    tree = bfs_tree(spark, edges_sym, start, **kw)
    parents = tree.filter(F.col("parent").isNotNull()).select(
        F.col("parent").alias("vid")
    )
    return tree.select("vid").join(parents, "vid", "left_anti").select("vid")


def neighbors_1hop(edges_sym: DataFrame, start: int) -> DataFrame:
    """Single expansion step (the adjacency row a traversal scans,
    dfs_bfs.h:57,99) → (vid)."""
    return (
        edges_sym.filter(F.col("src") == F.lit(start))
        .select(F.col("dst").alias("vid"))
        .distinct()
    )


def vertex_degree(edges_sym: DataFrame) -> DataFrame:
    """Degree per vertex = adjacency-row sum → (vid, degree).

    Self-loops count once here (the symmetrized view stores a loop
    twice only if stored twice upstream; our stores keep one copy).
    """
    return edges_sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def graph_stats(
    graph_ids: DataFrame, vertices: DataFrame, edges: DataFrame
) -> DataFrame:
    """Catalog view over all graphs (reference: ≤20 matrix files;
    n = file line 1) → (graph_id, n_vertices, n_edges). The graph-id
    catalog is the base so empty graphs (G4, n=0) get a zero row and
    isolated vids (G6) count via `vertices`.
    """
    v = vertices.groupBy("graph_id").agg(
        F.countDistinct("vid").alias("n_vertices")
    )
    e = edges.groupBy("graph_id").agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        graph_ids.join(v, "graph_id", "left")
        .join(e, "graph_id", "left")
        .select(
            "graph_id",
            F.coalesce(F.col("n_vertices"), F.lit(0)).cast("bigint").alias("n_vertices"),
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("bigint").alias("n_edges"),
        )
    )


def validate_start(vertices_one_graph: DataFrame, start: int) -> bool:
    """R10 bounds check (secondary_server.c:187-188): start must be a
    vertex of the graph, else "Starting vertex not present in graph".
    """
    return not vertices_one_graph.filter(F.col("vid") == F.lit(start)).isEmpty()
