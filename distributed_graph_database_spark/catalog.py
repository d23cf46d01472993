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

    `events.ts` is TIMESTAMP(NANOS) parquet, which Spark reads as int64
    nanos (session flag `nanosAsLong`); normalize it to a timestamp here
    so every consumer sees one schema. The testdata carries microsecond
    precision, so `DIV 1000` is lossless (DuckDB oracles read the same
    column natively as TIMESTAMP_NS).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        # Runtime-settable, and required even when the session didn't
        # come from our factory (e.g. the driver's own session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
