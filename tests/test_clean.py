"""pipeline_clean_corpus: the fused single-scan pipeline must equal
the composition of the standalone operators it fuses."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import clean, text


def test_fused_pipeline_equals_operator_composition(spark, sf_oracle):
    fp = text.text_fingerprint(spark, sf_oracle)
    q = text.text_quality(spark, sf_oracle)
    lid = text.text_lang_id(spark, sf_oracle)
    first = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    expected = {
        r.doc_id
        for r in first.join(q.filter("keep"), "doc_id")
        .join(lid.filter(F.col("lang_pred") == clean.KEEP_LANG), "doc_id")
        .select("doc_id")
        .collect()
    }
    got_rows = clean.pipeline_clean_corpus(spark, sf_oracle).collect()
    got = {r.doc_id for r in got_rows}
    assert got == expected
    # the pipeline actually filters: something kept, something dropped
    n_docs = table(spark, sf_oracle, "documents").count()
    assert 0 < len(got) < n_docs
    for r in got_rows:
        assert r.quality_score >= clean.KEEP_MIN_QUALITY
        assert r.lang_pred == clean.KEEP_LANG


def test_fused_pipeline_is_single_scan(spark, sf_oracle):
    """One scan of documents, no joins — the fusion claim."""
    plan = (
        clean.pipeline_clean_corpus(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2
    assert "Join" not in plan, plan
