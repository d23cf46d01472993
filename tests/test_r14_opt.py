"""Round-14 optimization laws.

Each test pins a rewrite this round made for performance to the
semantics it must preserve, or an invariant an optimization now leans
on (ADVICE r13):

- `_near_truth` single-pass verify ≡ the old candidate-then-verify
  two-pass shape (independent reimplementation, not a snapshot).
- NEAR_TRUTH_DF_CAP never binds on the swept SFs (ADVICE r13 #1): a
  data change that makes the df cap bind must fail HERE with a named
  reason, not silently skew the capped candidate join (the uncapped
  DuckDB oracle, the single-pass base count, and the
  `_dedup_incremental_delta` equality law all assume it).
- Embeddings carry non-null, fixed-EMBED_DIM, non-null-element vectors
  (ADVICE r13 #3): ml_logreg_step's n and ml_gmm_step's n_eff ride
  posexplode aggregates that drop null/empty arrays, and the r14
  argmax assignment folds over every vector — a loader change that
  introduces ragged vectors must fail here by name.
- The `_assign` n=1 argmax fast path ≡ the rank-window shape it
  replaced (same winner, same tie-break), checked against a window
  reimplementation on the live corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


SWEPT_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_near_truth_singlepass_equals_twopass(spark, sf_smoke):
    from distributed_graph_database_spark.pipeline import dedup as pl

    extra = pl.dedup_near_pairs(spark, sf_smoke).select("doc_a", "doc_b")
    new = pl._near_truth(spark, sf_smoke, extra_cand=extra)

    # independent two-pass reference: distinct candidate pairs, then
    # the candidate-restricted |∩| re-count over the FULL shingle table
    ex = pl._near_shingles(spark, sf_smoke)
    hot = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > pl.NEAR_TRUTH_DF_CAP)
        .select("h")
    )
    capped = ex.join(F.broadcast(hot), "h", "left_anti")
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .unionByName(extra)
        .distinct()
    )
    ref = pl._verified_pairs(cand, ex)
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0


@pytest.mark.parametrize("sf_dir", SWEPT_SFS)
def test_near_truth_cap_never_binds(spark, sf_dir):
    from distributed_graph_database_spark.pipeline import dedup as pl

    max_df = (
        pl._near_shingles(spark, sf_dir)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("m"))
        .first()["m"]
    )
    assert max_df < pl.NEAR_TRUTH_DF_CAP, (
        f"corpus-wide max shingle df {max_df} reached NEAR_TRUTH_DF_CAP="
        f"{pl.NEAR_TRUTH_DF_CAP} at {sf_dir}: the capped candidate join is "
        "no longer provably complete vs the uncapped oracle — raise the cap "
        "or re-derive the truth/incremental parity story"
    )


@pytest.mark.parametrize("sf_dir", SWEPT_SFS)
def test_embeddings_nonnull_fixed_dim(spark, sf_dir):
    from distributed_graph_database_spark.pipeline import similarity as pl

    bad = (
        pl._embeddings(spark, sf_dir)
        .filter(
            F.col("v").isNull()
            | (F.size("v") != pl.EMBED_DIM)
            | F.exists("v", lambda x: x.isNull())
        )
        .count()
    )
    assert bad == 0, (
        f"{bad} embeddings at {sf_dir} are null/ragged: the posexplode-"
        "derived row counts (ml_logreg_step n, ml_gmm_step n_eff) and the "
        "argmax assignment assume non-null fixed-d vectors"
    )


def test_assign_argmax_equals_window(spark, sf_smoke):
    from distributed_graph_database_spark.pipeline import similarity as pl

    emb = pl._embeddings(spark, sf_smoke)
    cells = pl._cells(spark, sf_smoke, pl.KMEANS_K)
    fast = pl._assign(emb, cells, "v", "cells", 1).select(
        "vec_id", F.explode("cells").alias("cell_id")
    )
    # rank-window reference (the pre-r14 shape)
    sim = pl._dot(F.col("v"), F.col("cv")) / (
        pl._norm("v") * pl._norm("cv")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cell_id")
    )
    ref = (
        emb.crossJoin(F.broadcast(cells))
        .select("vec_id", "cell_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )
    assert fast.exceptAll(ref).count() == 0
    assert ref.exceptAll(fast).count() == 0
