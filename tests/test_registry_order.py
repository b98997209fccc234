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

# The round-12 driver gate window: the 5 round-12 registrations
# (partial-MCU JPEG, progressive-restart JPEG, WebP metadata, VP8L
# lossless decode, exact substring dedup — never driver-checked), then
# the stalest backfill: ALL 24 names whose latest driver row is round
# 7, then the 21 alphabetically-first round-8 names (gate-debt decision
# recorded in COVERAGE.md: ≤5 new so ≥45 rows go to backfill; after
# r12 no query's latest gate is older than r8).
_ROUND12_WINDOW = [
    "multimodal_jpeg_partialmcu_decode",
    "multimodal_jpeg_prog_restart_decode",
    "multimodal_webp_metadata",
    "multimodal_webp_lossless_decode",
    "dedup_exact_substring",
    # -- backfill: latest driver row r7 --
    "multimodal_metadata", "ou_fit", "pairs_distance", "purged_kfold",
    "realized_moments", "repetition_profile", "return_entropy",
    "risk_ratios", "run_bars", "runs_test", "sadf_adf1",
    "similarity_topk_ivf", "similarity_topk_lsh", "size_quantiles",
    "stratified_sample", "text_analysis", "tfidf_topk", "trend_scan",
    "two_scale_rv", "ulcer_index", "variance_ratio", "vocab_divergence",
    "vocab_topk", "vpin",
    # -- backfill: latest driver row r8, alphabetical --
    "ac_schedule", "atr", "backtest_stats", "bde_cusum", "bet_sizing",
    "bigram_logprob", "bm25", "boilerplate", "bollinger", "bpe_pairs",
    "cluster_keywords", "code_detection", "corpus_funnel", "cs_zscore",
    "dedup_containment", "dedup_paragraph", "donchian", "drawdown_path",
    "dup_spans", "encoding_quality", "event_funnel",
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


def test_round12_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND12_WINDOW


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
