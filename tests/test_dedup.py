"""Dedup operators: LSH candidate-quality properties (precision /
high-similarity recall vs a brute-force baseline at sf0.001) and plan
shape. Exact keys are oracle-checked in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import dedup


def _brute_force_pairs(spark, sf_dir, threshold):
    """All-pairs shingle-Jaccard ≥ threshold — oracle-only shape (the
    cartesian product we must never ship; fine at 500 docs)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(dedup._shingles(dedup._norm_tokens())).alias("sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    return {
        (r.doc_a, r.doc_b): r.j
        for r in a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "j",
            F.size(F.array_intersect("a.sh", "b.sh"))
            / F.size(F.array_union("a.sh", "b.sh")),
        )
        .filter(F.col("j") >= threshold)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "j")
        .collect()
    }


def test_near_dedup_precision_and_high_recall(spark, sf_smoke):
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_near(spark, sf_smoke).collect()
    }
    truth = _brute_force_pairs(spark, sf_smoke, dedup.NEAR_JACCARD_T)
    # precision 1.0: every emitted pair is a true pair (exact-verified)
    assert set(got) <= set(truth), set(got) - set(truth)
    # high-similarity recall: pairs with J >= 0.8 have candidate
    # probability 1-(1-J^2)^8 >= 0.9997 per band config; with the fixed
    # seeds this is deterministic — pin that all are found.
    hot = {p for p, j in truth.items() if j >= 0.8}
    assert hot <= set(got), hot - set(got)


def test_near_dedup_no_cartesian_product(spark, sf_oracle):
    plan = (
        dedup.dedup_near(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_counts(spark, sf_oracle):
    out = dedup.dedup_exact(spark, sf_oracle)
    n_docs = table(spark, sf_oracle, "documents").count()
    survivors = out.count()
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == n_docs          # partition of the corpus
    assert survivors <= n_docs


def test_simhash_identical_docs_same_sketch(spark, sf_oracle):
    """Same normalized text ⇒ same simhash (sketch is content-pure)."""
    sim = dedup.dedup_simhash(spark, sf_oracle).alias("s")
    fp = (
        table(spark, sf_oracle, "documents")
        .select(
            "doc_id",
            F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))).alias("h"),
        )
        .alias("f")
    )
    joined = sim.join(fp, "doc_id")
    per_hash = joined.groupBy("h").agg(F.countDistinct("simhash").alias("k"))
    assert per_hash.filter(F.col("k") > 1).count() == 0
