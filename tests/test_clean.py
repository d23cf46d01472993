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


def test_dedup_report_composes_standalone_keys(spark, sf_smoke):
    """The funnel must equal a Python replay built from the STANDALONE
    key outputs (dedup_clusters, text_repetition, text_contamination)
    plus exact keep-first — the composition contract: funnel semantics
    can never drift from the operators users run individually."""
    import duckdb

    from distributed_graph_database_spark.pipeline import clean as c
    from distributed_graph_database_spark.pipeline.dedup import dedup_clusters
    from distributed_graph_database_spark.pipeline.text import (
        text_contamination,
        text_repetition,
    )

    con = duckdb.connect()
    base = con.execute(
        "SELECT doc_id, LEN(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS nt,"
        " md5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS h"
        f" FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    con.close()
    winners = {}
    for doc_id, _, h in base:
        winners[h] = min(winners.get(h, doc_id), doc_id)
    clusters = {
        r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf_smoke).collect()
    }
    rep = {r.doc_id: r.repetitive for r in text_repetition(spark, sf_smoke).collect()}
    contam = {
        r.doc_id: r.contaminated
        for r in text_contamination(spark, sf_smoke).collect()
    }
    want = {name: [0, 0] for name in c.FUNNEL_STAGES}
    for doc_id, nt, h in base:
        s1 = doc_id == winners[h]
        s2 = s1 and clusters.get(doc_id, doc_id) == doc_id
        s3 = s2 and not rep[doc_id]
        s4 = s3 and not contam.get(doc_id, True)
        for name, ok in zip(c.FUNNEL_STAGES, [True, s1, s2, s3, s4]):
            if ok:
                want[name][0] += 1
                want[name][1] += nt
    got = {
        r.stage: [r.n_docs, r.n_tokens]
        for r in c.corpus_dedup_report(spark, sf_smoke).collect()
    }
    assert got == want
    # funnel must be monotone non-increasing
    counts = [got[s][0] for s in c.FUNNEL_STAGES]
    assert counts == sorted(counts, reverse=True)
