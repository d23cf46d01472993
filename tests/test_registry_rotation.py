"""Driver-coverage rotation contract (VERDICT r5 item 1): the round
driver records correctness rows for only a ~50-key prefix of
registry.QUERIES, so the registry orders each family
least-recently-driver-verified first, derived from the committed
CORRECTNESS_r{N}.json artifacts. These tests pin that the rotation is
real (families are LRU-sorted), that it composes with the family
interleave, and that the derivation matches the artifacts on disk —
so coverage keeps accumulating in future rounds with zero hand edits.
"""

from __future__ import annotations

import glob
import json
import os
import re

from distributed_graph_database_spark import registry

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _artifact_last_seen() -> dict[str, int]:
    """Independent mirror of registry._driver_last_seen's verified-row
    whitelist: err-free non-mismatch rows count; no_oracle rows count
    only while the key is still declared rows-only (graduated keys —
    r8: store_stats_approx, text_bpe_train — resurface for a
    driver-signed hash row)."""
    from distributed_graph_database_spark import oracles

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            verified = (
                err is None and row.get("hash_match") is not False
            ) or (err == "no_oracle" and key not in oracles.ORACLE_SQL)
            if verified:
                out[key] = max(out.get(key, -1), rnd)
    return out


def test_last_seen_matches_committed_artifacts():
    assert registry._LAST_SEEN == _artifact_last_seen()


def test_families_are_lru_ordered_in_registry():
    """Within every source family dict's slice of QUERIES, driver-rank
    (last round seen; -1 = never) must be non-decreasing."""
    order = {k: i for i, k in enumerate(registry.QUERIES)}
    ls = registry._LAST_SEEN
    for fam in registry._FAMILIES:
        keys = sorted(fam, key=order.__getitem__)
        ranks = [ls.get(k, -1) for k in keys]
        assert ranks == sorted(ranks), f"family not LRU-ordered: {keys}"


def test_window_prefers_stale_keys():
    """The driver window must be dominated by keys NOT verified in the
    most recent recorded round — the accumulation property. (If every
    key has been seen in the latest round, rotation is moot and the
    assertion is vacuous-true by the guard.)"""
    ls = registry._LAST_SEEN
    if not ls:
        return
    latest = max(ls.values())
    prefix = list(registry.QUERIES)[:DRIVER_WINDOW]
    stale = [k for k in prefix if ls.get(k, -1) < latest]
    fresh_total = sum(1 for k in registry.QUERIES if ls.get(k, -1) >= latest)
    expected = min(DRIVER_WINDOW, len(registry.QUERIES) - fresh_total)
    # every window slot that *can* hold a stale key does, up to the
    # interleave's per-family pass structure: demand at least half.
    assert len(stale) >= min(expected, DRIVER_WINDOW // 2), (
        f"only {len(stale)} stale keys in the driver window; "
        f"{fresh_total} fresh keys total"
    )


def test_global_lru_order():
    """QUERIES iteration order must be globally non-decreasing in
    driver-last-seen round (never-seen = -1 first) — the guarantee
    that the driver's ~50-key window always takes the globally stalest
    keys, even when they concentrate in a single family (VERDICT r6
    item 1: 28 of 55 never-seen keys were relational, and per-family
    rotation + interleave alone fit only 27 into the window)."""
    ls = registry._LAST_SEEN
    ranks = [ls.get(k, -1) for k in registry.QUERIES]
    assert ranks == sorted(ranks)


def test_never_seen_keys_fill_window_first():
    """Every key with no driver row ever must precede every key that
    has one, up to the window size — so a 50-key window is spent
    entirely on never-signed keys while any remain."""
    ls = registry._LAST_SEEN
    keys = list(registry.QUERIES)
    never = [k for k in keys if ls.get(k, -1) < 0]
    if not never:
        return
    n_lead = min(len(never), DRIVER_WINDOW)
    head = keys[: len(never)]
    assert all(ls.get(k, -1) < 0 for k in head[:n_lead]), (
        f"window head contains driver-seen keys ahead of "
        f"{len(never)} never-seen ones"
    )


def test_never_seen_keys_lead_their_families():
    """Any key with no driver row ever must precede every
    already-verified key of its own family."""
    order = {k: i for i, k in enumerate(registry.QUERIES)}
    ls = registry._LAST_SEEN
    for fam in registry._FAMILIES:
        seen_positions = [order[k] for k in fam if ls.get(k, -1) >= 0]
        unseen_positions = [order[k] for k in fam if ls.get(k, -1) < 0]
        if seen_positions and unseen_positions:
            assert max(unseen_positions) < min(seen_positions), (
                f"never-driver-verified keys not leading family: {sorted(fam)}"
            )
