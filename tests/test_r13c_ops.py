"""Round-13 second-batch operator laws: rate limiting, search,
novelty, silhouette, and directed SCC — each new key checked against
an independent Python implementation or a structural invariant, plus
oracle parity at sf0.001 (the sweep covers sf0.01)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from distributed_graph_database_spark.catalog import table
from distributed_graph_database_spark.graph import analytics
from distributed_graph_database_spark.pipeline import events, similarity, text
from .oracle_harness import assert_parity


# ---------- events_rate_limit ----------

def test_rate_limit_matches_independent(spark, sf_smoke):
    rows = (
        table(spark, sf_smoke, "events")
        .select("user_id", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r.us)
    want = {}
    win = events.RATE_WINDOW_SEC * 1_000_000
    for u, ts in by_user.items():
        ts.sort()
        n_throttled = 0
        peak = 0
        for i, t in enumerate(ts):
            # RANGE frame: every event with us in [t - win, t];
            # equal-timestamp peers count even if they sort after i.
            cnt = sum(1 for x in ts if t - win <= x <= t)
            peak = max(peak, cnt)
            n_throttled += cnt > events.RATE_LIMIT_MAX
        want[u] = (len(ts), n_throttled, peak)
    got = {
        r.user_id: (r.n_events, r.n_throttled, r.peak_rate)
        for r in events.QUERIES["events_rate_limit"](spark, sf_smoke).collect()
    }
    assert got == want


def test_rate_limit_parity(spark, sf_smoke):
    assert_parity(
        events.QUERIES["events_rate_limit"](spark, sf_smoke),
        events.ORACLE_SQL["events_rate_limit"],
        sf_smoke,
        "events_rate_limit",
    )


# ---------- text_search ----------

def test_search_ranks_and_scores(spark, sf_smoke):
    rows = text.QUERIES["text_search"](spark, sf_smoke).collect()
    assert rows, "search returned no hits"
    rows.sort(key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)
        assert a.score >= b.score
    for r in rows:
        assert 1 <= r.n_terms <= len(text.SEARCH_TERMS)
        assert r.tf_total >= r.n_terms


def test_search_matches_independent(spark, sf_smoke):
    docs = table(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    n_corpus = len(docs)
    tf = {}
    for r in docs:
        toks = r.text.strip().lower().split()
        for t in text.SEARCH_TERMS:
            c = toks.count(t)
            if c:
                tf[(r.doc_id, t)] = c
    df = defaultdict(int)
    for (_, t), _c in tf.items():
        df[t] += 1
    scores = defaultdict(float)
    hits = defaultdict(int)
    for (d, t), c in tf.items():
        scores[d] += c * math.log(n_corpus / df[t])
        hits[d] += 1
    ranked = sorted(
        ((round(s, 6), d) for d, s in scores.items()),
        key=lambda p: (-p[0], p[1]),
    )[: text.SEARCH_TOP_K]
    got = {
        r.doc_id: (r.rank, r.score, r.n_terms)
        for r in text.QUERIES["text_search"](spark, sf_smoke).collect()
    }
    for rank, (score, d) in enumerate(ranked, 1):
        assert got[d] == (rank, score, hits[d])


# ---------- text_novelty ----------

def _u32(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def test_novelty_matches_independent(spark, sf_smoke):
    from distributed_graph_database_spark.pipeline.dedup import INCR_BASE_PCT

    docs = table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    k = text.NOVELTY_SHINGLE_K

    def grams(t):
        toks = t.strip().lower().split()
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }

    base_sh = set()
    delta = []
    for r in docs:
        g = grams(r.text)
        if _u32(r.doc_id) % 100 < INCR_BASE_PCT:
            base_sh |= g
        else:
            delta.append((r.source, r.doc_id, g))
    per_src = defaultdict(lambda: [set(), set(), set()])  # docs, sh, novel
    for src, d, g in delta:
        per_src[src][0].add(d)
        per_src[src][1] |= g
        per_src[src][2] |= g - base_sh
    got = {
        r.source: (r.n_docs, r.n_shingles, r.n_novel, r.novelty_pct)
        for r in text.QUERIES["text_novelty"](spark, sf_smoke).collect()
    }
    assert set(got) == set(per_src)
    for src, (d, sh, nv) in per_src.items():
        assert got[src] == (
            len(d),
            len(sh),
            len(nv),
            round(len(nv) * 100.0 / len(sh), 6),
        )


# ---------- ml_silhouette ----------

def test_silhouette_bounds_and_cover(spark, sf_smoke):
    """Assignment-to-nearest makes every simplified silhouette
    s = (a_sim - b_sim)/max(1-a_sim, 1-b_sim) land in [0, 1]; cluster
    sizes must partition the corpus."""
    out = similarity.QUERIES["ml_silhouette"](spark, sf_smoke).collect()
    n_corpus = table(spark, sf_smoke, "embeddings").count()
    assert sum(r.n_vecs for r in out) == n_corpus
    for r in out:
        assert 0.0 <= r.min_sil <= r.mean_sil <= 1.0


# ---------- graph_scc ----------

def _scc_independent(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    reach = {v: {v} for v in nodes}
    changed = True
    while changed:
        changed = False
        for v in nodes:
            new = set(reach[v])
            for u in list(new):
                new |= adj[u] | reach.get(u, set())
            if new != reach[v]:
                reach[v] = new
                changed = True
    return {
        v: min(u for u in reach[v] if v in reach[u]) for v in nodes
    }


def test_scc_matches_independent(spark, sf_smoke):
    edges = {
        (r.src, r.dst)
        for r in analytics._scc_directed_edges(spark, sf_smoke).collect()
    }
    want = _scc_independent(edges)
    got = {
        r.vid: r.scc_id
        for r in analytics.QUERIES["graph_scc"](spark, sf_smoke).collect()
    }
    assert got == want


def test_scc_condensation_is_dag(spark, sf_smoke):
    """No directed cycle may cross SCC boundaries: contracting each
    SCC to one node must leave an acyclic digraph."""
    comp = {
        r.vid: r.scc_id
        for r in analytics.QUERIES["graph_scc"](spark, sf_smoke).collect()
    }
    edges = {
        (comp[r.src], comp[r.dst])
        for r in analytics._scc_directed_edges(spark, sf_smoke).collect()
        if comp[r.src] != comp[r.dst]
    }
    # Kahn: a DAG drains completely.
    indeg = defaultdict(int)
    adj = defaultdict(set)
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    for a, b in edges:
        if b not in adj[a]:
            adj[a].add(b)
            indeg[b] += 1
    queue = [v for v in nodes if indeg[v] == 0]
    seen = 0
    while queue:
        v = queue.pop()
        seen += 1
        for u in adj[v]:
            indeg[u] -= 1
            if indeg[u] == 0:
                queue.append(u)
    assert seen == len(nodes), "condensation contains a cycle"
