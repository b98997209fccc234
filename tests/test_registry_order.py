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

# The round-9 driver gate window: the 14 round-8 registrations that have
# never been driver-checked, then the 36 stalest backfill names.
_ROUND9_WINDOW = [
    "portfolio_capacity", "hrp_weights", "risk_contributions",
    "token_budget_curves", "bpe_train_merges", "bpe_token_budget",
    "multimodal_png_decode", "pcm_band_power", "multimodal_gif_decode",
    "multimodal_jpeg_decode", "dedup_survivor_budget",
    "spread_band_backtest", "embedding_drift", "dedup_recall_curve",
    "return_acf", "roll_adjust", "rolling_beta", "semdedup",
    "sequential_bootstrap", "sessionize", "sign_autocorr",
    "similarity_topk_ivf_pq", "spread_signal", "tfidf_cosine_pairs",
    "unigram_logprob", "var_cvar", "asof_join_backward",
    "asof_join_nearest", "bar_groups_split", "char_entropy",
    "chunk_documents", "cusum_filter", "daily_vol", "decontaminate",
    "dedup_exact", "dedup_minhash_lsh", "deflated_sharpe",
    "dollar_bars", "dsir_weights", "event_transitions",
    "ewm_std_native", "fama_macbeth", "fama_macbeth_nw",
    "fixed_time_return", "frac_diff", "funnel_latency", "har_rv",
    "hawkes_intensity", "interval_join_events", "ks_drift",
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


def test_round9_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND9_WINDOW


def test_every_query_name_is_unique_and_self_consistent():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    for name, q in QUERIES.items():
        assert q.name == name
