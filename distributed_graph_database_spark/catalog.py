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
    """Scan one table. Plain parquet scan → Catalyst gets pushdown/pruning."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
