"""Local replica of the driver's DuckDB differential check (t2).

For every key present in both ``queries()`` and ``oracle_sql()``, run
the Spark query and the DuckDB SQL over the same parquet tables and
compare row count, column names, and order-insensitive values —
pre-validating CORRECTNESS_r{N}.json before the driver does.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from distributed_graph_database_spark.catalog import TABLES


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify values, sort rows — an
    order-insensitive canonical form mirroring the driver's hash."""
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            out[c] = col.astype(str)
        elif str(col.dtype).startswith("float"):
            # repr-stable: floats compared via repr of float64
            out[c] = col.astype("float64").map(repr)
        else:
            out[c] = col.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, key: str = "?") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(run_duckdb(oracle_sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"{key}: column mismatch spark={list(got.columns)} duck={list(want.columns)}"
    )
    assert len(got) == len(want), f"{key}: rowcount spark={len(got)} duck={len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            {"spark": got[diff_mask].head(5), "duck": want[diff_mask].head(5)}, axis=1
        )
        raise AssertionError(f"{key}: value mismatch; first diffs:\n{sample}")
