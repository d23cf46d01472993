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
        for r in dedup.dedup_near_pairs(spark, sf_smoke).collect()
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
        dedup._dedup_near(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_df_cap_excludes_hot_shingles(spark):
    """The intersect-join input must exclude any (source, shingle)
    with document frequency > NGRAM_DF_CAP — the 100 TB stop-shingle
    guard. Synthetic corpus: one shingle shared by CAP+6 docs (hot),
    one unique shingle family per doc (cold)."""
    n = dedup.NGRAM_DF_CAP + 6
    docs = spark.createDataFrame(
        [(i, "src", f"hot hot hot u{i} u{i} u{i}") for i in range(n)],
        "doc_id long, source string, text string",
    )
    capped = dedup._capped_shingles(docs)
    hot_hash = spark.range(1).select(
        F.xxhash64(F.lit("hot hot hot"))
    ).first()[0]
    # the hot shingle is gone from the join input...
    assert capped.filter(F.col("h") == hot_hash).count() == 0
    # ...no surviving (source, h) bucket exceeds the cap...
    max_df = (
        capped.groupBy("source", "h").count().agg(F.max("count")).first()[0]
    )
    assert max_df <= dedup.NGRAM_DF_CAP
    # ...and cold shingles all survive (3 per doc: the other 3-grams).
    assert capped.count() == 3 * n


def test_ngram_df_cap_noop_on_testdata(spark, sf_oracle):
    """Testdata dfs (max 3 at sf0.01) sit far below the cap, so the
    capped join input equals the uncapped explode — the exact-oracle
    guarantee for dedup_ngram rests on this."""
    docs = table(spark, sf_oracle, "documents").select("doc_id", "source", "text")
    capped = dedup._capped_shingles(docs).count()
    uncapped = (
        dedup._hashed_shingle_docs(docs, ["doc_id", "source"])
        .select(F.explode("sh"))
        .count()
    )
    assert capped == uncapped


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


def test_near_dedup_recall_pinned_on_testdata(spark, sf_oracle):
    """The measured-recall companion key (VERDICT r2 #5): with the
    module's fixed seeds, recall vs the blocked-exact truth is a
    deterministic constant of the dataset — pinned at 1.0 on sf0.01
    (every true same-source pair at the shared threshold is found)."""
    row = dedup.dedup_near_recall(spark, sf_oracle).collect()[0]
    assert (row.n_true, row.recall_ok) == (1, True)
    # the raw measured recall (pre-graduation output) stays pinned
    truth = dedup.dedup_ngram(spark, sf_oracle).select("doc_a", "doc_b")
    found = dedup.dedup_near_pairs(spark, sf_oracle).select("doc_a", "doc_b")
    n_true = truth.count()
    n_found = truth.intersect(found).count()
    assert (n_true, n_found) == (1, 1)


def test_near_audit_pinned_on_testdata(spark, sf_oracle):
    """The graduated dedup_near audit key (r11): one row signing both
    LSH contracts against the corpus-wide exact truth. With fixed
    seeds on fixed data the measured values are constants — pinned:
    25 corpus-wide true pairs at sf0.01, precision 1, recall 1.0
    (min true-pair Jaccard on testdata is 0.9 at sf0.01, far above
    the banding's reliable-detection region)."""
    rows = dedup.dedup_near(spark, sf_oracle).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_true, r.precision_ok, r.recall_ok) == (25, True, True)
    # the raw corpus-wide recall (the value behind recall_ok) is 1.0:
    # LSH found exactly the truth set
    truth = dedup._near_truth_cached(spark, sf_oracle).select("doc_a", "doc_b")
    found = dedup.dedup_near_pairs(spark, sf_oracle).select("doc_a", "doc_b")
    assert truth.exceptAll(found).count() == 0
    assert found.exceptAll(truth).count() == 0


def test_near_truth_df_cap_noop_on_testdata(spark, sf_oracle):
    """Corpus-wide shingle dfs (max 7 at sf0.01, 25 at sf0.1) sit far
    below NEAR_TRUTH_DF_CAP, so the capped truth-candidate input
    equals the uncapped substrate — the exact-oracle guarantee for
    the dedup_near audit rests on this (the oracle is uncapped)."""
    ex = dedup._near_shingles(spark, sf_oracle)
    max_df = ex.groupBy("h").count().agg(F.max("count")).first()[0]
    assert max_df <= dedup.NEAR_TRUTH_DF_CAP
