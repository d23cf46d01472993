"""text_bpe_train vs an independent reference implementation of
classical BPE (Sennrich et al.'s algorithm: count adjacent symbol
pairs weighted by word frequency, merge the argmax left-to-right
non-overlapping, repeat) run on the same corpus. Since r8 the key
also has an exact unrolled-CTE DuckDB oracle; this suite is the
third, independent leg (Spark ≡ oracle ≡ classical reference)."""

from __future__ import annotations

import re
from collections import Counter


def _reference_bpe(word_counts, n_merges):
    """→ (merge table, final word→symbols state) — the state is what
    classical BPE encoding applies to unseen-at-encode-time text; here
    the dict covers the corpus, so it IS the encoding."""
    state = {w: tuple(w) for w in word_counts}
    merges = []
    for rnd in range(n_merges):
        pc = Counter()
        for w, cnt in word_counts.items():
            sym = state[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += cnt
        if not pc:
            break
        # argmax: count DESC, then lexicographic pair
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c))
        merged = l + r
        for w in state:
            sym = state[w]
            out = []
            for s in sym:
                if out and out[-1] == l and s == r:
                    out[-1] = merged
                else:
                    out.append(s)
            state[w] = tuple(out)
    return merges, state


def test_bpe_train_matches_reference(spark, sf_oracle):
    from distributed_graph_database_spark.pipeline.text import (
        BPE_MERGES,
        text_bpe_train,
    )

    import duckdb

    words = duckdb.connect().execute(
        "SELECT w, COUNT(*) FROM (SELECT unnest(string_split_regex(trim(text), "
        f"'\\s+')) AS w FROM read_parquet('{sf_oracle}/documents.parquet')) "
        "GROUP BY w"
    ).fetchall()
    want, _ = _reference_bpe(dict(words), BPE_MERGES)
    got = sorted(
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in text_bpe_train(spark, sf_oracle).collect()
    )
    assert got == sorted(want)


def test_bpe_oracle_positional_merge_handles_equal_pair_runs(tmp_path):
    """The DuckDB oracle replays the sequential fold POSITIONALLY (see
    _oracle_bpe_train); the only non-obvious branch is l = r, where
    greedy left-to-right pairing merges even run offsets ("aaaa" →
    "aa","aa", "aaaaa" → "aa","aa","a"). Feed a run-heavy corpus and
    check oracle == independent classical reference on every round."""
    import duckdb

    from distributed_graph_database_spark.pipeline.text import (
        BPE_MERGES,
        _oracle_bpe_train,
    )

    docs = [
        "aaaa aaaaa aa aaa",
        "aaaa aaaa baaab",
        "aaab aaab abba abab",
        "bb bbb bbbb aabb",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(docs))
        + ") t(doc_id, text)"
    )
    got = sorted(map(tuple, con.execute(_oracle_bpe_train()).fetchall()))
    counts = Counter(w for t in docs for w in t.split())
    want = sorted(_reference_bpe(dict(counts), BPE_MERGES)[0])
    assert got == want


def test_bpe_encode_matches_reference(spark, sf_smoke):
    """text_bpe_encode's per-doc counts vs the classical reference:
    train on the corpus's word counts, then every doc's BPE token
    count is the sum of its words' final symbol-list lengths (BPE is
    word-local). Also pins n_ws_tokens to the raw token count."""
    import re

    import duckdb

    from distributed_graph_database_spark.pipeline.text import (
        BPE_MERGES,
        text_bpe_encode,
    )

    rows = duckdb.connect().execute(
        "SELECT doc_id, trim(text) FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    doc_words = {d: re.split(r"\s+", t) for d, t in rows}
    counts = Counter(w for ws in doc_words.values() for w in ws)
    _, state = _reference_bpe(dict(counts), BPE_MERGES)
    want = {
        d: (len(ws), sum(len(state[w]) for w in ws))
        for d, ws in doc_words.items()
    }
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in text_bpe_encode(spark, sf_smoke).collect()
    }
    assert got == want
