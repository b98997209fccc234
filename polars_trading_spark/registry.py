"""The query registry: every implemented operator as a (Spark, oracle) pair.

The registry itself now lives in per-domain modules under
``polars_trading_spark/oracles/`` — each registers its queries into the
shared ``QUERIES`` dict at import time.  THE IMPORT ORDER BELOW, plus the
rotation front applied at the end, defines the driver-gate insertion
order; tests/test_registry_order.py pins the resulting order against a
committed manifest.  Keep new domain modules ABOVE the rotation block.
"""

from __future__ import annotations

from polars_trading_spark.oracles._shared import (  # noqa: F401
    QUERIES,
    Query,
    register,
)

# Domain modules register on import — ORDER IS CONTRACTUAL.
from polars_trading_spark.oracles import bars as _bars  # noqa: E402,F401
from polars_trading_spark.oracles import labels as _labels  # noqa: E402,F401
from polars_trading_spark.oracles import timeseries as _timeseries  # noqa: E402,F401
from polars_trading_spark.oracles import stats as _stats  # noqa: E402,F401
from polars_trading_spark.oracles import microstructure as _microstructure  # noqa: E402,F401
from polars_trading_spark.oracles import portfolio as _portfolio  # noqa: E402,F401
from polars_trading_spark.oracles import indicators as _indicators  # noqa: E402,F401
from polars_trading_spark.oracles import events as _events  # noqa: E402,F401
from polars_trading_spark.oracles import text as _text  # noqa: E402,F401
from polars_trading_spark.oracles import similarity as _similarity  # noqa: E402,F401
from polars_trading_spark.oracles import text_stats as _text_stats  # noqa: E402,F401
from polars_trading_spark.oracles import dedup as _dedup  # noqa: E402,F401
from polars_trading_spark.oracles import corpus as _corpus  # noqa: E402,F401
from polars_trading_spark.oracles import multimodal as _multimodal  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "register"]



# ==========================================================================
# Driver-gate rotation.
#
# The driver's correctness harness verifies the FIRST 50 entries of
# ``queries()`` insertion order (rows + schema + value-hash vs the DuckDB
# oracle at sf0.01).  History: rounds 1-4 gated the original first 50
# registrations; round 5 gated 50 later ones (48 green, 2 determinism
# bugs fixed + re-gated green in round 6); round 6 (50/50 green) covered
# the then-unchecked 26 + re-checks + backfill; round 7 (50/50 green)
# covered the 18 round-6 registrations + 28 stale backfill + 4 re-checks.
#
# KEEP THIS BLOCK AT THE VERY END OF THE FILE — the rotation runs after
# every domain module has registered; new queries (and new domain module
# imports) belong ABOVE it and enter the gate on a later rotation.
# ==========================================================================


def _rotate_front(front: list) -> None:
    missing = [n for n in front if n not in QUERIES]
    if missing:  # fail loudly at import if the list drifts from the registry
        raise KeyError(f"rotation names not registered: {missing}")
    ordered = front + [n for n in QUERIES if n not in set(front)]
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


# Round-8 rotation, PRE-COMPUTED from CORRECTNESS_r01–r07 latest-round
# history.  Front = the 18 round-7 registrations (never driver-checked)
# + the 32 alphabetically-first names whose latest driver row is
# round 5 (the stalest cohort after the r6/r7 windows).  A 50/50 green
# CORRECTNESS_r08 completes driver coverage: all 162 queries registered
# through round 7 will then have at least one green driver row.
# (The remaining r5-latest names, starting with return_acf, rotate in
# round 9, together with any round-8 registrations.)

_ROUND8_FRONT = [
    # -- the 18 round-7 registrations, never driver-checked --
    "lexical_diversity", "encoding_quality", "heaps_law",
    "term_burstiness", "rank_ic", "url_domains", "code_detection",
    "lang_mix", "atr", "bollinger", "macd", "bm25", "stochastic", "obv",
    "session_vwap", "donchian", "hampel_filter", "robust_moments",
    # -- 32 backfill: latest driver row is round 5 (stalest cohort) --
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

# Round-9 rotation, PRE-COMPUTED from CORRECTNESS_r01-r08 latest-round
# history.  Front = the 14 round-8 registrations (never driver-checked;
# hrp_weights / bpe_train_merges / bpe_token_budget are rows-only) + the
# 36 stalest backfill names (latest driver row r5, then r6
# alphabetical).  A 50/50 green CORRECTNESS_r09 completes driver
# coverage: every query registered through round 8 will then have at
# least one green driver row.  (Remaining r6-latest names, starting
# with multimodal_bmp_metadata, rotate in round 10 together with any
# round-9 registrations.)

_ROUND9_FRONT = [
    # -- the 14 round-8 registrations, never driver-checked --
    "portfolio_capacity", "hrp_weights", "risk_contributions",
    "token_budget_curves", "bpe_train_merges", "bpe_token_budget",
    "multimodal_png_decode", "pcm_band_power", "multimodal_gif_decode",
    "multimodal_jpeg_decode", "dedup_survivor_budget",
    "spread_band_backtest", "embedding_drift", "dedup_recall_curve",
    # -- 36 backfill: latest driver row is round 5, then r6 alpha --
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

# Round-10 rotation, computed from CORRECTNESS_r01-r09 latest-round
# history.  Front = the 14 round-9 registrations (never driver-checked)
# + the 3 formerly rows-only queries (hrp_weights / bpe_train_merges /
# bpe_token_budget — they went `err: no_oracle` in round 9's window;
# round 10 gives them recursive-CTE DuckDB oracles, so they re-enter
# the window to flip to hash-gated PASS) + the 33 stalest backfill
# names (latest driver row r6 alphabetical from multimodal_bmp_metadata,
# then r7 alphabetical).  (Remaining r7-latest names — corpus_stats,
# corwin_schultz, cpcv_assign, then csw_explosiveness onward — rotate
# in round 11, together with any round-10 registrations not fronted
# below.)

_ROUND10_FRONT = [
    # -- the 14 round-9 registrations, never driver-checked --
    "walk_forward", "walk_forward_rolling", "spread_band_backtest_net",
    "rank_portfolio_net", "lsh_power_curve", "contamination_report",
    "benchmark_coverage", "multimodal_jpeg_color_decode",
    "multimodal_png_palette_decode", "multimodal_gif_interlaced_decode",
    "multimodal_png_interlaced_decode", "multimodal_jpeg_420_decode",
    "spread_band_tearsheet", "rank_portfolio_tearsheet",
    # -- the 3 newly-oracled round-8 queries (r9 rows were no_oracle) --
    "hrp_weights", "bpe_train_merges", "bpe_token_budget",
    # -- 33 backfill: latest driver row is round 6, then r7 alpha --
    "multimodal_bmp_metadata", "multimodal_jpeg_metadata",
    "ngram_novelty", "pack_sequences", "permutation_entropy",
    "pmi_cooccurrence", "reading_ease", "rsi", "sadf", "sample_weights",
    "similarity_topk", "similarity_topk_ivf_kmeans", "tick_bars",
    "tick_quality", "time_bars", "time_bars_compound_duration",
    "triple_barrier", "triple_barrier_meta", "universe_summary",
    "upsample_ffill", "vertical_barrier", "volume_bars",
    "vwap_slippage", "winnow_dup_pairs", "winnow_fingerprints",
    "zipf_fit", "ann_recall", "bar_volatility", "centroid_similarity",
    "cluster_representatives", "cointegration", "corpus_filter",
    "corpus_split",
]

_rotate_front(_ROUND10_FRONT)
