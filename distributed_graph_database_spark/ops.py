"""Ops/consistency layer — the reference's distinctive request
semantics re-expressed as declarative queries over an ops log.

Reference lineage (SURVEY.md §2.1 R8/R10/R11):
- routing: ops 1,2 → primary; ops 3,4 → secondary by sequence parity,
  odd→secondary_1, even→secondary_2 (load_balancer.c:78-99).
- validation: op must be 1..4 (client.c:36-39); op 1 requires the
  graph NOT exist, ops 2-4 require it to exist (client.c:43-49,
  access(2) on the file).
- seq-ordered write application: the readers-writers protocol's
  semantic residue is that writes land in increasing sequence order,
  so the final state of a graph is its last valid write
  (primary_server.c:62-107; Assignment 2.pdf p.6).

"Exists at seq s" has a closed form because the op set has no delete:
a graph exists if it is a pre-existing fixture, or if the *first*
valid op-1 on it (which is simply the earliest op-1, for non-fixture
graphs) happened at a lower seq. That keeps all three queries pure
window/join algebra — no iteration, shuffle count O(1), and the same
logic is expressible verbatim in the DuckDB oracle.
"""

from __future__ import annotations

import os
from .session import staging_root

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import fixtures

_REJECT_BAD_OP = "bad_op"
_REJECT_EXISTS = "exists"
_REJECT_MISSING = "missing"


def _annotated_log(spark: SparkSession) -> DataFrame:
    """Ops log + per-row validity verdict (the R10 predicate set)."""
    log = fixtures.ops_log_df(spark)
    pre = spark.createDataFrame(
        [(g,) for g in fixtures.existing_graph_ids()], "graph_id string"
    ).withColumn("pre_existing", F.lit(True))

    # Earliest op-1 per non-fixture graph = its creation seq.
    created = (
        log.filter(F.col("op") == 1)
        .join(pre, "graph_id", "left_anti")
        .groupBy("graph_id")
        .agg(F.min("seq").alias("created_seq"))
    )

    annotated = (
        log.join(F.broadcast(pre.select("graph_id", "pre_existing")), "graph_id", "left")
        .join(F.broadcast(created), "graph_id", "left")
        .withColumn(
            "exists_before",
            F.coalesce(F.col("pre_existing"), F.lit(False))
            # coalesce: NULL created_seq (never created) must read as
            # "does not exist", not SQL-null (three-valued logic trap).
            | F.coalesce(F.col("created_seq") < F.col("seq"), F.lit(False)),
        )
    )
    return annotated.withColumn(
        "reason",
        F.when(~F.col("op").between(1, 4), F.lit(_REJECT_BAD_OP))
        .when((F.col("op") == 1) & F.col("exists_before"), F.lit(_REJECT_EXISTS))
        .when((F.col("op") > 1) & ~F.col("exists_before"), F.lit(_REJECT_MISSING))
        .otherwise(F.lit(None).cast("string")),
    ).withColumn("status", F.when(F.col("reason").isNull(), "valid").otherwise("rejected"))


def validate_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: per-request verdict → (seq, op, graph_id, status, reason)."""
    return _annotated_log(spark).select(
        "seq", "op", "graph_id", "status",
        F.coalesce(F.col("reason"), F.lit("ok")).alias("reason"),
    )


def route_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 parity router over *valid* requests; rejected ones never
    reach a server (the client gates them) → (seq, op, graph_id, server)."""
    return _annotated_log(spark).select(
        "seq", "op", "graph_id",
        F.when(F.col("status") == "rejected", F.lit("rejected"))
        .when(F.col("op") <= 2, F.lit("primary"))
        .when(F.pmod(F.col("seq"), F.lit(2)) == 1, F.lit("secondary_1"))
        .otherwise(F.lit("secondary_2"))
        .alias("server"),
    )


def ops_log_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: apply valid writes in seq order; last-write-wins state per
    graph → (graph_id, last_seq, last_op, n_writes)."""
    writes = _annotated_log(spark).filter(
        (F.col("status") == "valid") & (F.col("op") <= 2)
    )
    w = Window.partitionBy("graph_id").orderBy(F.col("seq").desc())
    return (
        writes.withColumn("rn", F.row_number().over(w))
        .withColumn("n_writes", F.count(F.lit(1)).over(Window.partitionBy("graph_id")))
        .filter(F.col("rn") == 1)
        .select(
            "graph_id",
            F.col("seq").alias("last_seq"),
            F.col("op").alias("last_op"),
            "n_writes",
        )
    )


def ops_request_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-server load report over the routed log → (server, n_requests,
    n_reads, n_writes, pct_of_total): the observability face of the
    reference's topology — the load balancer's parity split
    (load_balancer.c:78-99) exists precisely to balance read load
    across the two secondaries, and this is the report that would
    verify it. Composes the declared router (same annotated log) with
    one tiny aggregate; pct is a division of identical integers, so it
    hash-matches."""
    routed = route_requests(spark, sf_dir)
    counts = routed.groupBy("server").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum((F.col("op") >= 3).cast("bigint")).alias("n_reads"),
        F.sum((F.col("op") <= 2).cast("bigint")).alias("n_writes"),
    )
    total = counts.agg(F.sum("n_requests").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "server",
        "n_requests",
        "n_reads",
        "n_writes",
        F.round(F.col("n_requests") / F.col("total"), 6).alias("pct_of_total"),
    )


_SNAP_STAGED: dict[tuple[str, str], str] = {}


def _snapshot_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-level snapshot history of every graph the ops log writes:
    each VALID write (op 1 add / op 2 modify) carries a full
    replacement edge set (primary_server.c:111-152 rewrites the whole
    graph file), so versions are (initial fixture state if the graph
    pre-existed) + one per valid write, ranked by seq."""
    writes = _annotated_log(spark).filter(
        (F.col("status") == "valid") & (F.col("op") <= 2)
    ).select("graph_id", "seq")
    # Loud-fail coupling: every valid write must have a payload entry
    # in WRITE_PAYLOADS — a silent inner-join drop would fake an empty
    # version. The authority is the DICT (its keys), not the edge
    # rows, because this store's output contract is one row per edge:
    # an empty-edge-set payload would be invisible at the row level,
    # so fixtures.WRITE_PAYLOADS loudly rejects empty payloads and
    # this check rejects missing ones.
    pay = fixtures.write_payloads_df(spark)
    payload_seqs = spark.createDataFrame(
        [(s,) for s in fixtures.WRITE_PAYLOADS], "seq bigint"
    )
    n_orphan = writes.join(
        F.broadcast(payload_seqs), "seq", "left_anti"
    ).count()
    if n_orphan != 0:
        # RuntimeError, not assert: this loud-fail contract must
        # survive `python -O` (ADVICE r7).
        raise RuntimeError(f"{n_orphan} valid write(s) with no payload")
    written = writes.select("graph_id").distinct()
    initial = (
        fixtures.fixture_edges_df(spark)
        .join(F.broadcast(written), "graph_id", "left_semi")
        .withColumn("seq", F.lit(0).cast("bigint"))
        .select("graph_id", "seq", "src", "dst")
    )
    from_log = writes.join(pay, "seq").select("graph_id", "seq", "src", "dst")
    snaps = initial.unionByName(from_log)
    return snaps.withColumn(
        "version",
        F.dense_rank()
        .over(Window.partitionBy("graph_id").orderBy("seq"))
        .cast("int"),
    )


def _snapshot_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _SNAP_STAGED.get(key)
    if hit is not None:
        return hit
    import hashlib

    # md5 prefix keeps the mapping injective — the readable slug alone
    # maps '/', '.', and '_' all to '_', so distinct sf_dirs could
    # alias one staging directory and silently serve each other's data.
    slug = "".join(c if c.isalnum() else "_" for c in sf_dir)
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(
        staging_root(spark),
        f"dgdb_ops_{spark.sparkContext.applicationId}_graphsnap_"
        f"{slug}_{digest}",
    )
    (
        _snapshot_edges(spark, sf_dir)
        .write.mode("overwrite")
        .partitionBy("graph_id", "version")
        .parquet(d)
    )
    _SNAP_STAGED[key] = d
    return d


def graph_ops_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R3 write path × snapshot time travel: replay the ops log's
    valid graph writes (each a full-state payload, the reference's
    whole-file rewrite semantics, primary_server.c:111-152; routed to
    the primary by load_balancer.c:78-84) into an immutable
    version-partitioned parquet store, then read EVERY version back →
    (graph_id, version, seq, src, dst). Version 1 of a pre-existing
    graph is its fixture state (seq 0); each valid write appends the
    next version — nothing is updated in place, the
    store_time_travel discipline applied to the graph store. A
    VERSION-AS-OF read of any single version is a partition-pruned
    scan of one (graph_id, version) directory; writers only ever add
    new version partitions, so readers never block (the reference
    needed a readers-writers lock for exactly this; the snapshot
    store dissolves the problem)."""
    d = _snapshot_dir(spark, sf_dir)
    return spark.read.parquet(d).select(
        "graph_id",
        F.col("version").cast("int").alias("version"),
        "seq",
        "src",
        "dst",
    )


QUERIES = {
    "route_requests": route_requests,
    "validate_requests": validate_requests,
    "ops_log_replay": ops_log_replay,
    "ops_request_stats": ops_request_stats,
    "ops_graph_snapshot": graph_ops_snapshot,
}


def _oracle_cte() -> str:
    """Shared DuckDB CTE rebuilding the same annotated log from the
    single-source-of-truth fixture literals."""
    return f"""
log(seq, op, graph_id) AS (VALUES {fixtures.ops_log_values_sql()}),
pre(graph_id) AS (VALUES {fixtures.existing_graphs_values_sql()}),
created AS (
    SELECT graph_id, MIN(seq) AS created_seq FROM log
    WHERE op = 1 AND graph_id NOT IN (SELECT graph_id FROM pre)
    GROUP BY graph_id
),
ann AS (
    SELECT l.seq, l.op, l.graph_id,
           (l.graph_id IN (SELECT graph_id FROM pre)
            OR COALESCE(c.created_seq < l.seq, FALSE)) AS exists_before,
           CASE
             WHEN l.op NOT BETWEEN 1 AND 4 THEN '{_REJECT_BAD_OP}'
             WHEN l.op = 1 AND (l.graph_id IN (SELECT graph_id FROM pre)
                                OR COALESCE(c.created_seq < l.seq, FALSE))
               THEN '{_REJECT_EXISTS}'
             WHEN l.op > 1 AND NOT (l.graph_id IN (SELECT graph_id FROM pre)
                                    OR COALESCE(c.created_seq < l.seq, FALSE))
               THEN '{_REJECT_MISSING}'
           END AS reason
    FROM log l LEFT JOIN created c USING (graph_id)
)
"""


ORACLE_SQL = {
    "validate_requests": f"""
WITH {_oracle_cte()}
SELECT seq, op, graph_id,
       CASE WHEN reason IS NULL THEN 'valid' ELSE 'rejected' END AS status,
       COALESCE(reason, 'ok') AS reason
FROM ann
""",
    "route_requests": f"""
WITH {_oracle_cte()}
SELECT seq, op, graph_id,
       CASE WHEN reason IS NOT NULL THEN 'rejected'
            WHEN op <= 2 THEN 'primary'
            WHEN seq % 2 = 1 THEN 'secondary_1'
            ELSE 'secondary_2' END AS server
FROM ann
""",
    "ops_log_replay": f"""
WITH {_oracle_cte()},
writes AS (SELECT * FROM ann WHERE reason IS NULL AND op <= 2)
SELECT graph_id,
       CAST(MAX(seq) AS BIGINT) AS last_seq,
       CAST(ARG_MAX(op, seq) AS INT) AS last_op,
       COUNT(*) AS n_writes
FROM writes GROUP BY graph_id
""",
    "ops_graph_snapshot": f"""
WITH {_oracle_cte()},
pay(seq, src, dst) AS (VALUES {fixtures.write_payloads_values_sql()}),
fe(graph_id, src, dst) AS (VALUES {fixtures.fixture_edges_values_sql()}),
writes AS (
    SELECT graph_id, seq FROM ann WHERE reason IS NULL AND op <= 2
),
snap_edges AS (
    SELECT w.graph_id, w.seq, p.src, p.dst
    FROM writes w JOIN pay p USING (seq)
    UNION ALL
    SELECT fe.graph_id, 0 AS seq, fe.src, fe.dst
    FROM fe
    WHERE fe.graph_id IN (SELECT graph_id FROM pre)
      AND fe.graph_id IN (SELECT graph_id FROM writes)
)
SELECT graph_id,
       CAST(DENSE_RANK() OVER (PARTITION BY graph_id ORDER BY seq) AS INT)
         AS version,
       CAST(seq AS BIGINT) AS seq,
       CAST(src AS BIGINT) AS src,
       CAST(dst AS BIGINT) AS dst
FROM snap_edges
""",
    "ops_request_stats": f"""
WITH {_oracle_cte()},
routed AS (
    SELECT op,
           CASE WHEN reason IS NOT NULL THEN 'rejected'
                WHEN op <= 2 THEN 'primary'
                WHEN seq % 2 = 1 THEN 'secondary_1'
                ELSE 'secondary_2' END AS server
    FROM ann
),
counts AS (
    SELECT server, COUNT(*) AS n_requests,
           CAST(SUM(CASE WHEN op >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_reads,
           CAST(SUM(CASE WHEN op <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_writes
    FROM routed GROUP BY server
)
SELECT server, n_requests, n_reads, n_writes,
       ROUND(n_requests / CAST((SELECT SUM(n_requests) FROM counts) AS DOUBLE),
             6) AS pct_of_total
FROM counts
""",
}
