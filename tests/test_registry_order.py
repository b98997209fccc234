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

# The round-8 driver gate window: the 18 round-7 registrations that have
# never been driver-checked, then the 32 stalest round-5-gated names.
_ROUND8_WINDOW = [
    "lexical_diversity", "encoding_quality", "heaps_law",
    "term_burstiness", "rank_ic", "url_domains", "code_detection",
    "lang_mix", "atr", "bollinger", "macd", "bm25", "stochastic", "obv",
    "session_vwap", "donchian", "hampel_filter", "robust_moments",
    "ac_schedule", "backtest_stats", "bde_cusum", "bet_sizing",
    "bigram_logprob", "boilerplate", "bpe_pairs", "cluster_keywords",
    "corpus_funnel", "cs_zscore", "dedup_containment", "dedup_paragraph",
    "drawdown_path", "dup_spans", "event_funnel", "feature_matrix",
    "imbalance_bars_adaptive", "intraday_profile", "jump_test",
    "lead_lag", "ledoit_wolf", "lz_entropy", "ma_crossover",
    "mix_corpus", "momentum_rank", "pair_correlation", "pcm_features",
    "pii_scrub", "psi_drift", "range_bars", "rank_portfolio",
    "retention",
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


def test_round8_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND8_WINDOW


def test_every_query_name_is_unique_and_self_consistent():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    for name, q in QUERIES.items():
        assert q.name == name
