"""DuckDB oracle SQL for every hash-checkable declared query.

The driver runs each ``registry.QUERIES[key]`` on Spark and the SQL
here on DuckDB over the same parquet views, then compares row count +
schema + order-insensitive value hash. Keys absent here get a weaker
rows-only check (reserved for genuinely approximate / non-SQL ops).

The graph oracles rebuild the pinned derivation and the BFS loop as a
bounded recursive CTE with min-level semantics. Every constant —
edge derivation, symmetrization, start vertex, round bound, bfs_order
cap — is interpolated from the SAME module constants the Spark code
uses (graph/derive.py, graph/traversal.py), so the two sides cannot
silently drift.
"""

from __future__ import annotations

from . import fixtures, ops, relational
from .pipeline import clean as pl_clean
from .pipeline import dedup as pl_dedup
from .pipeline import events as pl_events
from .pipeline import multimodal as pl_mm
from .pipeline import similarity as pl_sim
from .pipeline import text as pl_text
from .sources import formats, matrix
from .graph import analytics as g_analytics
from .streaming import events_stream as streaming
from .graph.derive import DEFAULT_START_SQL, DERIVED_EDGES_SQL, DERIVED_SYM_SQL
from .graph.traversal import BFS_ORDER_MAX_VERTICES, MAX_LEVELS_DEFAULT

_GRAPH_CTE = f"""
sym AS ({DERIVED_SYM_SQL}),
start AS (SELECT {DEFAULT_START_SQL} AS vid),
walk(vid, level) AS (
    SELECT vid, 0 FROM start
    UNION
    SELECT s.dst, w.level + 1
    FROM walk w JOIN sym s ON s.src = w.vid
    WHERE w.level < {MAX_LEVELS_DEFAULT}
),
lvl AS (SELECT vid, MIN(level) AS level FROM walk GROUP BY vid)
"""

_TREE_CTE = f"""{_GRAPH_CTE},
tree_parents AS (
    SELECT c.vid AS vid, MIN(s.src) AS parent
    FROM lvl c
    JOIN sym s ON s.dst = c.vid
    JOIN lvl p ON p.vid = s.src AND p.level = c.level - 1
    GROUP BY c.vid
)
"""

# Double-sweep diameter estimate: farthest-from-start (max level, max
# vid tiebreak — mirroring the Spark orderBy) seeds a second walk;
# its eccentricity is the reported lower bound.
_DIAMETER_CTE = f"""{_GRAPH_CTE},
far AS (SELECT vid FROM lvl ORDER BY level DESC, vid DESC LIMIT 1),
walk2(vid, level) AS (
    SELECT vid, 0 FROM far
    UNION
    SELECT s.dst, w.level + 1
    FROM walk2 w JOIN sym s ON s.src = w.vid
    WHERE w.level < {MAX_LEVELS_DEFAULT}
),
lvl2 AS (SELECT vid, MIN(level) AS level FROM walk2 GROUP BY vid)
"""

ORACLE_SQL: dict[str, str] = {
    "graph_diameter": f"""
WITH RECURSIVE {_DIAMETER_CTE}
SELECT (SELECT CAST(vid AS BIGINT) FROM far) AS sweep_start,
       CAST(MAX(level) AS INT) AS diameter_lb,
       COUNT(*) AS n_reached
FROM lvl2
""",
    "bfs_levels": f"""
WITH RECURSIVE {_GRAPH_CTE}
SELECT CAST(vid AS BIGINT) AS vid, CAST(level AS INT) AS level FROM lvl
""",
    "bfs_order": f"""
WITH RECURSIVE {_GRAPH_CTE},
capped AS (SELECT vid, level FROM lvl
           ORDER BY level, vid LIMIT {BFS_ORDER_MAX_VERTICES})
SELECT string_agg(CAST(vid AS VARCHAR), ' ' ORDER BY level, vid) AS bfs_order FROM capped
""",
    "dfs_leaves": f"""
WITH RECURSIVE {_TREE_CTE}
SELECT CAST(l.vid AS BIGINT) AS vid
FROM lvl l
WHERE l.vid NOT IN (SELECT parent FROM tree_parents WHERE parent IS NOT NULL)
""",
    "reachable_vertices": f"""
WITH RECURSIVE {_GRAPH_CTE}
SELECT CAST(vid AS BIGINT) AS vid FROM lvl
""",
    "neighbors_1hop": f"""
WITH sym AS ({DERIVED_SYM_SQL}),
start AS (SELECT {DEFAULT_START_SQL} AS vid)
SELECT DISTINCT CAST(s.dst AS BIGINT) AS vid FROM sym s, start WHERE s.src = start.vid
""",
    "vertex_degree": f"""
WITH sym AS ({DERIVED_SYM_SQL})
SELECT CAST(src AS BIGINT) AS vid, COUNT(*) AS degree FROM sym GROUP BY src
""",
    "vertex_degree_hist": f"""
WITH sym AS ({DERIVED_SYM_SQL}),
deg AS (SELECT src AS vid, COUNT(*) AS degree FROM sym GROUP BY src)
SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_vertices
FROM deg GROUP BY degree
""",
    # comp(v) = min vid reachable from v — the same value hash-min
    # label propagation converges to; the UNION-dedup bounds recursion
    # at the transitive closure, no explicit level cap needed.
    "graph_components": f"""
WITH RECURSIVE sym AS ({DERIVED_SYM_SQL}),
verts AS (SELECT DISTINCT src AS vid FROM sym),
walk(vid, lbl) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.vid
)
SELECT CAST(vid AS BIGINT) AS vid, CAST(MIN(lbl) AS BIGINT) AS comp
FROM walk GROUP BY vid
""",
    "graph_stats": f"""
WITH fixture_vertices(graph_id, vid) AS (VALUES {fixtures.fixture_vertices_values_sql()}),
fixture_edges(graph_id, src, dst) AS (VALUES {fixtures.fixture_edges_values_sql()}),
gids(graph_id) AS (VALUES {fixtures.existing_graphs_values_sql()}),
v AS (SELECT graph_id, COUNT(DISTINCT vid) AS n_vertices FROM fixture_vertices GROUP BY graph_id),
ec AS (SELECT graph_id, COUNT(*) AS n_edges FROM fixture_edges GROUP BY graph_id)
SELECT g.graph_id,
       CAST(COALESCE(v.n_vertices, 0) AS BIGINT) AS n_vertices,
       CAST(COALESCE(ec.n_edges, 0) AS BIGINT) AS n_edges
FROM gids g LEFT JOIN v USING (graph_id) LEFT JOIN ec USING (graph_id)
""",
    **relational.ORACLE_SQL,
    **ops.ORACLE_SQL,
    **matrix.ORACLE_SQL,
    **formats.ORACLE_SQL,
    **pl_text.ORACLE_SQL,
    **pl_clean.ORACLE_SQL,
    **pl_dedup.ORACLE_SQL,
    **pl_sim.ORACLE_SQL,
    **pl_events.ORACLE_SQL,
    **g_analytics.ORACLE_SQL,
    **pl_mm.ORACLE_SQL,
    **streaming.ORACLE_SQL,
}
