"""Pin the registry's QUERIES insertion order against the committed
manifest.

The driver's correctness gate verifies the FIRST 50 entries of
``queries()`` insertion order, so any accidental reorder — a domain
module import shuffled in registry.py, a rotation-list edit, a merge
mishap in an oracle module — silently changes WHAT GETS GATED.  The
manifest (polars_trading_spark/oracles/MANIFEST.txt) is the committed
contract; regenerate it deliberately when registering new queries:

    python -c "import polars_trading_spark.registry as r; \\
        open('polars_trading_spark/oracles/MANIFEST.txt','w')\\
        .write('\\n'.join(r.QUERIES) + '\\n')"
"""

from __future__ import annotations

import os

from polars_trading_spark.registry import QUERIES

_MANIFEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "polars_trading_spark",
    "oracles",
    "MANIFEST.txt",
)

# The round-13 driver gate window: the 5 round-13 registrations (AVI
# metadata + stride-sampled MJPEG frame stats, combined 12-bit/
# scan-subset JPEG decode, VP8L predictor transform, cleaned-text
# exact substring dedup — never driver-checked), then the stalest
# backfill: ALL 29 names whose latest driver row is round 8, then the
# 16 alphabetically-first round-9 names (≤5-new gate-debt cap held;
# after r13 no query's latest gate is older than r9).
_ROUND13_WINDOW = [
    "multimodal_avi_metadata",
    "multimodal_avi_frame_stats",
    "multimodal_jpeg_extended_decode",
    "multimodal_webp_predictor_decode",
    "dedup_exact_substring_clean",
    # -- backfill: latest driver row r8 --
    "feature_matrix", "hampel_filter", "heaps_law",
    "imbalance_bars_adaptive", "intraday_profile", "jump_test",
    "lang_mix", "lead_lag", "ledoit_wolf", "lexical_diversity",
    "lz_entropy", "ma_crossover", "macd", "mix_corpus", "momentum_rank",
    "obv", "pair_correlation", "pcm_features", "pii_scrub", "psi_drift",
    "range_bars", "rank_ic", "rank_portfolio", "retention",
    "robust_moments", "session_vwap", "stochastic", "term_burstiness",
    "url_domains",
    # -- backfill: latest driver row r9, alphabetical --
    "asof_join_backward", "asof_join_nearest", "bar_groups_split",
    "char_entropy", "chunk_documents", "cusum_filter", "daily_vol",
    "decontaminate", "dedup_exact", "dedup_minhash_lsh",
    "dedup_recall_curve", "dedup_survivor_budget", "deflated_sharpe",
    "dollar_bars", "dsir_weights", "embedding_drift",
]


def test_queries_order_matches_manifest():
    with open(_MANIFEST) as f:
        manifest = f.read().split()
    names = list(QUERIES)
    assert names == manifest, (
        "QUERIES insertion order drifted from the committed manifest — "
        "if this was a deliberate registration/rotation change, "
        "regenerate MANIFEST.txt (see module docstring); otherwise a "
        "module import or oracle merge silently reordered the gate "
        "window.  First divergence: "
        + next(
            (
                f"index {i}: registry={a!r} manifest={b!r}"
                for i, (a, b) in enumerate(zip(names, manifest))
                if a != b
            ),
            f"length {len(names)} vs {len(manifest)}",
        )
    )


def test_round13_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND13_WINDOW


def test_every_never_gated_query_is_inside_the_gate_window():
    """The coverage invariant behind the rotation discipline: a query
    with no CORRECTNESS_r*.json row yet (never driver-gated) MUST sit
    inside the active window's first 50 — otherwise a new registration
    silently misses its driver gate this round."""
    import glob
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    gated: set = set()
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(p) as f:
            gated.update(json.load(f).keys())
    window = set(list(QUERIES)[:50])
    missing = sorted(
        n for n in QUERIES if n not in gated and n not in window
    )
    assert missing == [], (
        "never-driver-gated queries outside the active gate window "
        f"(add them to oracles/rotation.py ACTIVE_FRONT): {missing}"
    )


def test_every_query_name_is_unique_and_self_consistent():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    for name, q in QUERIES.items():
        assert q.name == name
