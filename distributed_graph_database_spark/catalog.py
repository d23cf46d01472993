"""Table access over the driver-generated parquet testdata.

The filesystem directory is the catalog (mirrors the reference, where
file existence was the only metadata — client.c:43-49); here each
scale-factor directory holds one parquet file per table. At 100 TB the
same layout becomes a partitioned-parquet/warehouse path per table;
nothing in the engine assumes single-file tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain parquet scan → Catalyst gets pushdown/pruning.

    `events.ts` is stored as parquet TIMESTAMP(isAdjustedToUTC=false,
    MICROS), which Spark reads as TIMESTAMP_NTZ; normalize it to a plain
    session-TZ TIMESTAMP here so every consumer sees one schema. The
    session TZ is pinned to UTC (runtime-settable, so this also covers
    sessions that didn't come from our factory — e.g. the driver's own),
    which makes the NTZ wall-clock → instant interpretation exact and
    epoch arithmetic identical to the DuckDB oracle's EPOCH(ts) on the
    same naive timestamps. A legacy int64-nanos branch is kept for
    sessions that read old TIMESTAMP(NANOS) data behind
    `spark.sql.legacy.parquet.nanosAsLong`.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
