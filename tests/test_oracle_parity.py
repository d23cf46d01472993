"""Differential test: every declared hash-checkable query must match
its DuckDB oracle at sf=0.01 — the exact gate the driver applies."""

from __future__ import annotations

import pytest

from distributed_graph_database_spark import oracles, registry

from .oracle_harness import assert_parity

KEYS = sorted(set(registry.QUERIES) & set(oracles.ORACLE_SQL))


def test_all_oracle_keys_have_queries():
    missing = set(oracles.ORACLE_SQL) - set(registry.QUERIES)
    assert not missing, f"oracle SQL without a Spark query: {missing}"


@pytest.mark.parametrize("key", KEYS)
def test_oracle_parity(spark, sf_oracle, key):
    df = registry.QUERIES[key](spark, sf_oracle)
    assert_parity(df, oracles.ORACLE_SQL[key], sf_oracle, key)
