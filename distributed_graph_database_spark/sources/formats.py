"""Source/sink format breadth beyond parquet and the reference's
matrix text (sources/matrix.py): JSONL and CSV roundtrips, plus
small-file compaction — the storage-management ops every ingest
pipeline runs before analytics.

Each key materializes documents through the format under test into a
per-(session, sf) staging dir, reads it back with an explicit schema
(schema-on-read stays at the ingest edge, SURVEY.md §1.3), and
aggregates — so the oracle (same aggregate straight off parquet)
verifies the roundtrip is lossless END TO END, quoting/escaping
included (documents.text exercises spaces and punctuation; the
driver's ASCII guarantee is asserted in tests).

Scale notes: a real ingest writes once and reads many — the staging
write is keyed like the bucketed tables (once per session+sf). The
compaction key demonstrates the small-files fix (16 shards → 2) with
explicit repartition counts; at 100 TB the same op runs with
maxRecordsPerFile / target-size math instead of fixed counts.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

COMPACT_FILES_BEFORE = 16
COMPACT_FILES_AFTER = 2

_STAGED: dict[tuple[str, str, str], str] = {}


def _staging_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write documents once per (session, sf, format); return the dir."""
    key = (spark.sparkContext.applicationId, sf_dir, fmt)
    hit = _STAGED.get(key)
    if hit is not None:
        return hit
    # Path carries the application id: staging dirs are per-session,
    # so a concurrent test/bench/driver pair can never race on one
    # directory (overwrite-in-place of a shared path is not atomic).
    d = os.path.join(
        tempfile.gettempdir(),
        f"dgdb_fmt_{spark.sparkContext.applicationId}_{fmt}_"
        + "".join(c if c.isalnum() else "_" for c in sf_dir),
    )
    docs = table(spark, sf_dir, "documents")
    if fmt == "jsonl":
        docs.write.mode("overwrite").json(d)
    elif fmt == "csv":
        # quote-all so embedded commas/quotes in text survive; header
        # carries column names for schema-on-read engines.
        docs.write.mode("overwrite").option("header", True).option(
            "quoteAll", True
        ).csv(d)
    elif fmt == "compact":
        docs.repartition(COMPACT_FILES_BEFORE).write.mode("overwrite").parquet(d)
    else:
        raise ValueError(fmt)
    _STAGED[key] = d
    return d


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    """Aggregate that touches every column, so silent corruption of
    any of them (type coercion, quote mangling, null-vs-empty) breaks
    the hash: per-source doc count, id sum, char totals."""
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
            F.sum(F.length("text")).cast("bigint").alias("sum_text_chars"),
            F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


ORACLE_ROUNDTRIP_AGG = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_text_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents GROUP BY source
"""


def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → read back (explicit schema) → aggregate;
    hash-equal to the same aggregate off parquet ⇔ lossless roundtrip."""
    d = _staging_dir(spark, sf_dir, "jsonl")
    return _roundtrip_agg(spark.read.schema(DOC_SCHEMA).json(d))


def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quoted CSV → read back (explicit schema, header) →
    aggregate; hash-equal off parquet ⇔ quoting/escaping is lossless."""
    d = _staging_dir(spark, sf_dir, "csv")
    return _roundtrip_agg(
        spark.read.schema(DOC_SCHEMA).option("header", True).csv(d)
    )


def store_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a COMPACT_FILES_BEFORE-shard parquet dir
    rewritten to COMPACT_FILES_AFTER files → one row (n_files_before,
    n_files_after, n_rows). Row count is oracle-checked against the
    source table; file counts are pinned literals in the oracle, so a
    partitioner change that silently alters the file layout fails the
    hash."""
    src = _staging_dir(spark, sf_dir, "compact")
    before = spark.read.parquet(src)
    dst = src + "_out"
    before.repartition(COMPACT_FILES_AFTER).write.mode("overwrite").parquet(dst)

    def _n_parts(d: str) -> int:
        return len([f for f in os.listdir(d) if f.startswith("part-")])

    after = spark.read.parquet(dst)
    return (
        after.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .select(
            F.lit(_n_parts(src)).cast("bigint").alias("n_files_before"),
            F.lit(_n_parts(dst)).cast("bigint").alias("n_files_after"),
            "n_rows",
        )
    )


ORACLE_STORE_COMPACT = f"""
SELECT CAST({COMPACT_FILES_BEFORE} AS BIGINT) AS n_files_before,
       CAST({COMPACT_FILES_AFTER} AS BIGINT) AS n_files_after,
       COUNT(*) AS n_rows
FROM documents
"""


PRUNE_LANG = "en"


def _partitioned_dir(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, "bylang")
    hit = _STAGED.get(key)
    if hit is not None:
        return hit
    d = os.path.join(
        tempfile.gettempdir(),
        f"dgdb_fmt_{spark.sparkContext.applicationId}_bylang_"
        + "".join(c if c.isalnum() else "_" for c in sf_dir),
    )
    table(spark, sf_dir, "documents").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(d)
    _STAGED[key] = d
    return d


def store_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning end to end: documents written
    `partitionBy(lang)`, then a one-language aggregate whose scan
    touches ONLY that partition's directory — `PartitionFilters` in
    the plan, zero I/O on every other language (plan-asserted in
    tests). The single most important scan optimization at 100 TB:
    partition columns turn predicates into directory listings.
    Output: (source, n_docs, sum_chars) for PRUNE_LANG documents."""
    d = _partitioned_dir(spark, sf_dir)
    return (
        spark.read.parquet(d)
        .filter(F.col("lang") == PRUNE_LANG)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


ORACLE_STORE_PARTITION_PRUNE = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = '{PRUNE_LANG}'
GROUP BY source
"""


QUERIES = {
    "source_jsonl_roundtrip": source_jsonl_roundtrip,
    "source_csv_roundtrip": source_csv_roundtrip,
    "store_compact": store_compact,
    "store_partition_prune": store_partition_prune,
}

ORACLE_SQL = {
    "source_jsonl_roundtrip": ORACLE_ROUNDTRIP_AGG,
    "source_csv_roundtrip": ORACLE_ROUNDTRIP_AGG,
    "store_compact": ORACLE_STORE_COMPACT,
    "store_partition_prune": ORACLE_STORE_PARTITION_PRUNE,
}
