"""Property tests for the two operators with subtle boundary
semantics the fixed testdata can't fully cover: skyline (dominance
ties — equal-on-both-coords pairs must BOTH survive; equal on one
coord must resolve by the other) and the token chunker (coverage and
overlap laws of the stride arithmetic)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# --- skyline ---------------------------------------------------------------

def _skyline_model(rows):
    out = []
    for i, (p, d) in enumerate(rows):
        dominated = any(
            (p2 <= p and d2 <= d and (p2 < p or d2 < d))
            for j, (p2, d2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append((i, p, d))
    return sorted(out)


points_case = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),
              st.integers(min_value=0, max_value=6)),
    min_size=1, max_size=25,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=points_case)
def test_skyline_scan_matches_dominance_definition(spark, rows):
    """Drive the same two-level prefix-min scan ql_skyline uses over
    random tiny coordinates (many exact ties) and compare against the
    brute-force dominance definition."""
    from distributed_graph_database_spark.relational import SKYLINE_BLOCK_CENTS

    df = spark.createDataFrame(
        [(i, p, d) for i, (p, d) in enumerate(rows)],
        "o_orderkey bigint, p bigint, d bigint",
    )
    from pyspark.sql import Window

    pm = df.groupBy("p").agg(F.min("d").alias("pmd"))
    pm = pm.withColumn("b", F.floor(F.col("p") / SKYLINE_BLOCK_CENTS))
    blocks = pm.groupBy("b").agg(F.min("pmd").alias("bmin"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    blocks = blocks.withColumn("prev_blocks_min", F.min("bmin").over(wb))
    wp = Window.partitionBy("b").orderBy("p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    big = F.lit(10**9)
    pm = (
        pm.join(F.broadcast(blocks.select("b", "prev_blocks_min")), "b")
        .withColumn("in_block_min", F.min("pmd").over(wp))
        .withColumn("strict_min", F.least(
            F.coalesce("prev_blocks_min", big),
            F.coalesce("in_block_min", big),
        ))
    )
    joined = df.join(pm.select("p", "pmd", "strict_min"), "p")
    dominated = (F.col("strict_min") <= F.col("d")) | (F.col("pmd") < F.col("d"))
    got = sorted(
        (r.o_orderkey, r.p, r.d) for r in joined.filter(~dominated).collect()
    )
    assert got == _skyline_model(rows)


# --- chunker ---------------------------------------------------------------

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_tokens=st.integers(min_value=1, max_value=200))
def test_chunk_arithmetic_covers_every_token_once_per_window(spark, n_tokens):
    """Laws of the stride arithmetic on a synthetic doc of n distinct
    tokens: (1) every token appears in ≥1 chunk; (2) chunk k starts at
    k·stride; (3) all chunks are full except possibly the tail; (4)
    consecutive chunks overlap by exactly size-stride tokens (when
    both are full)."""
    from distributed_graph_database_spark.pipeline.clean import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
    )

    doc = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(n_tokens)))], "doc_id bigint, text string"
    )
    arr = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(arr)
    starts = doc.select(
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
        ).alias("chunk_id", "s"),
        arr.alias("arr"),
    )
    rows = starts.select(
        "chunk_id", "s", F.slice(F.col("arr"), F.col("s") + 1, CHUNK_SIZE).alias("c")
    ).collect()
    seen = set()
    for r in sorted(rows, key=lambda r: r.chunk_id):
        assert r.s == r.chunk_id * CHUNK_STRIDE
        expect_len = min(CHUNK_SIZE, n_tokens - r.s)
        assert len(r.c) == expect_len
        seen.update(r.c)
    assert len(seen) == n_tokens
