"""Rotation-schedule invariants for the catalog's driver window.

Round 6's lesson (VERDICT r6, "What's wrong #1"): the schedule comment in
queries.py *estimated* how many entries preceded the stale-FAIL block
("~60"), reality was 105, and the driver window missed the block for a third
consecutive round.  These tests make the schedule COMPUTED: they re-derive
the never-driver-checked set from the repo's own CORRECTNESS_r*.json
evidence files and assert the window-front invariants directly, so a drifted
_PRIORITY list fails CI instead of silently wasting a round of driver
coverage.

The evidence snapshot is pinned to the rounds available when the rotation
was built (ROTATION_BUILT_FOR_EVIDENCE) so the assertions are deterministic;
when a new CORRECTNESS file lands, test_no_stale_fail_outside_window still
checks the one invariant that must hold against ALL evidence.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver checked exactly 50 entries in every recorded round (r1-r6).
WINDOW = 50

# Evidence files the current _PRIORITY ordering was computed from.
ROTATION_BUILT_FOR_EVIDENCE = [
    f"CORRECTNESS_r{i:02d}.json" for i in range(1, 13)
]

# Window entries that are NOT justified by never-checked/stale-FAIL status.
# r10 canaries: with the never-checked backlog down to 39 entries there is
# window room for an 8-canary regression sweep spanning the headline
# families, weighted toward operators whose upstream prefix the r10
# _scanmeta hardening touched (exchange-stop + streaming passthrough
# change which plans receive the conditional scan-spread:
# text/dedup/similarity/search scan chains). to_returns/pricing_summary
# signal comes from the driver bench, which runs them every round (r9
# precedent) — their slots went to the volume_bars/dollar_bars re-checks.
# r11: with every catalog entry driver-green after r10, there is no
# never-checked backlog to spend slots on — the window's non-code-changed
# slots all go to STALENESS REFRESH (the oldest green rows), which double
# as green-block canaries. No separately-declared canary set this round.
CANARIES: set = set()
# entries whose code changed in round 13 — all value-identical on the
# driver's sf0.01 data, so they ride OUTSIDE the window (the r12 verdict's
# #1 ask consumes all 50 slots with the r6/r7 staleness tail):
# chi_square (>=0 clamp on the identity-form statistic — only changes
# values on degenerate near-cancellation tables; oracle mirrored),
# grid_snap (sign-correct floor/ceil division — only changes values on
# negative timestamps, which the driver data does not contain), ann_topk
# (guard cost: bounded count probe instead of two full count jobs — plan
# change only). Each was locally re-verified via tools/check_correctness.py
# and gained a property/unit test this round; listed so the window MAY
# include them without tripping the justification check.
CODE_CHANGED = {
    "chi_square",
    "grid_snap",
    "ann_topk",
    # r13 battery finds, all locally oracle-re-verified: newey_west_tstat
    # and effective_sample_size (short-group lag sums NULL-poisoned the
    # variance/autocorr factor — both ALSO sit in the window's r6 block),
    # kyle_lambda (ANSI DIVIDE_BY_ZERO in F.corr on constant groups —
    # r2 now from guarded moments)
    "newey_west_tstat",
    "effective_sample_size",
    "kyle_lambda",
    # r13 corr-audit (same ANSI DIVIDE_BY_ZERO class as kyle_lambda, all
    # guarded-moment rewrites, value-identical where defined, locally
    # oracle-re-verified): spearman_ic, zipf_slope, rolling_corr +
    # rolling_stats (rolling_zscore's bare division)
    "spearman_ic",
    "zipf_slope",
    "rolling_corr",
    "rolling_stats",
    # r13 ANSI zero-div audit, second sweep (bare mean/std divisions on
    # constant/degenerate series — NULL-guarded to match the DuckDB
    # oracle's zero-div convention; all locally oracle-re-verified):
    "calc_sharpe",
    "calc_risk_return_ratio",
    "calc_information_ratio",
    "calc_burstiness",
    "calc_price_volatility_ratio",
    # r13 ANSI zero-div audit, third sweep (zero span / zero total
    # volume / zero total weight on sparse or degenerate groups — the
    # COMMON case at scale; all locally oracle-re-verified):
    "calc_trade_rate",
    "calc_volume_rate",
    "calc_vwap",
    "calc_price_impact",
    "time_bars",
    "tick_bars",
    "volume_bars",
    "dollar_bars",
    "imbalance_bars",
    "idle_time",
    "intraday_profile",
    "execution_slippage",
    "quote_analytics",
    "rebase",
    "portfolio_returns",
    # r13 ANSI zero-div audit, fourth sweep (constant regressor /
    # empty-PSI-side / zero-volume streaming bars; oracle-re-verified):
    "ols_residual_diagnostics",
    "jensen_alpha",
    "psi_drift",
    "streaming_vwap",
    "streaming_time_bars",
    "streaming_preagg_interval_join",
}
# r13 staleness-refresh cutoff: every non-code-changed window entry must
# have a last driver row at or below this round (the r6/r7 staleness tail).
STALE_REFRESH_MAX_ROUND = 7


def _evidence(files):
    """(checked_names, last_status) from the given CORRECTNESS files."""
    checked, last = set(), {}
    for fname in files:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            continue
        rnd = int(fname.split("_r")[1].split(".")[0])
        data = json.load(open(path))
        for name, row in data.items():
            checked.add(name)
            prev = last.get(name)
            if prev is None or rnd >= prev[0]:
                ok = bool(row.get("hash_match")) if isinstance(row, dict) else False
                last[name] = (rnd, ok)
    return checked, last


@pytest.fixture(scope="module")
def catalog_order():
    from ffn_polars_spark.queries import QUERY_FNS

    return list(QUERY_FNS)


def test_priority_names_all_registered(catalog_order):
    """Every name in _PRIORITY must be a registered catalog entry — a typo
    would be silently ignored by _reorder_catalog and hollow out the
    window."""
    from ffn_polars_spark.queries import _PRIORITY

    registered = set(catalog_order)
    unknown = [n for n in _PRIORITY if n not in registered]
    assert unknown == [], f"_PRIORITY names not in catalog: {unknown}"
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY names"


def test_stale_and_never_green_block_leads(catalog_order):
    """Positions 0..9 are entries in the worst evidence state: a stale
    driver FAIL, never driver-checked — or, when neither exists (the r11
    regime: all 302 entries green), the OLDEST green rows in the catalog
    (their last driver round equals the catalog-wide minimum)."""
    checked, last = _evidence(ROTATION_BUILT_FOR_EVIDENCE)
    stale_fail = {n for n, (_, ok) in last.items() if not ok}
    never = set(catalog_order) - checked
    block = set(catalog_order[:10])
    if stale_fail or never:
        assert block <= (stale_fail | never), (
            f"window front has driver-green entries: "
            f"{block - (stale_fail | never)}"
        )
        assert stale_fail <= block, (
            f"stale-FAIL entries outside positions 0..9: {stale_fail - block}"
        )
    else:
        # the front must be a prefix of the staleness order: no block entry
        # newer than the 10th-oldest last-round in the catalog (the r11
        # exact-minimum check broke once the minimum round held fewer than
        # 10 entries — 2 r4 rows in the r12 evidence)
        rounds = sorted(rnd for rnd, _ in last.values())
        threshold = rounds[min(len(rounds), 10) - 1]
        too_new = {n for n in block if last[n][0] > threshold}
        assert too_new == set(), (
            f"window front entries newer than the staleness tail "
            f"(r{threshold}): {too_new}"
        )


def test_window_front_is_justified(catalog_order):
    """Every entry in the 50-entry driver window is there for a computed
    reason: never driver-checked, last row FAIL, declared canary, or code
    changed this round."""
    checked, last = _evidence(ROTATION_BUILT_FOR_EVIDENCE)
    never = set(catalog_order) - checked
    stale_fail = {n for n, (_, ok) in last.items() if not ok}
    stale_refresh = {
        n for n, (rnd, _) in last.items() if rnd <= STALE_REFRESH_MAX_ROUND
    }
    allowed = never | stale_fail | CANARIES | CODE_CHANGED | stale_refresh
    window = catalog_order[:WINDOW]
    unjustified = [n for n in window if n not in allowed]
    assert unjustified == [], (
        f"window entries with no computed justification: {unjustified}"
    )


def test_never_checked_packed_behind_window(catalog_order):
    """All never-driver-checked entries (per the evidence snapshot) sit in
    the window or immediately behind it — never behind an already-green
    non-canary entry — so they front-load the next round's window."""
    checked, _ = _evidence(ROTATION_BUILT_FOR_EVIDENCE)
    never = [n for n in catalog_order if n not in checked]
    positions = {n: i for i, n in enumerate(catalog_order)}
    limit = WINDOW + len([n for n in never if positions[n] >= WINDOW])
    stragglers = [n for n in never if positions[n] >= limit]
    assert stragglers == [], (
        f"never-checked entries stranded behind green blocks: {stragglers}"
    )


def test_no_stale_fail_outside_window_any_evidence(catalog_order):
    """Against ALL evidence files present (including ones newer than the
    rotation snapshot): an entry whose most recent driver row is a FAIL must
    be inside the next window.  This is the invariant that, had it existed,
    would have caught rounds 5 and 6."""
    files = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    _, last = _evidence(files)
    stale_fail = {n for n, (_, ok) in last.items() if not ok}
    window = set(catalog_order[:WINDOW])
    outside = sorted(stale_fail - window)
    assert outside == [], (
        f"entries with a stale driver FAIL outside the {WINDOW}-entry "
        f"window: {outside} — rebuild _PRIORITY"
    )
