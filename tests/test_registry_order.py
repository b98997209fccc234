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

# The round-10 driver gate window: the 14 round-9 registrations that
# have never been driver-checked, the 3 formerly rows-only queries
# (newly DuckDB-oracled this round, re-gated to flip no_oracle -> PASS),
# then the 33 stalest backfill names.
_ROUND10_WINDOW = [
    "walk_forward", "walk_forward_rolling", "spread_band_backtest_net",
    "rank_portfolio_net", "lsh_power_curve", "contamination_report",
    "benchmark_coverage", "multimodal_jpeg_color_decode",
    "multimodal_png_palette_decode", "multimodal_gif_interlaced_decode",
    "multimodal_png_interlaced_decode", "multimodal_jpeg_420_decode",
    "spread_band_tearsheet", "rank_portfolio_tearsheet",
    "hrp_weights", "bpe_train_merges", "bpe_token_budget",
    # -- round-10 registrations --
    "multimodal_jpeg_422_decode", "bpe_encode", "bpe_pack_sequences",
    "implementation_shortfall", "execution_tearsheet",
    "quality_classifier", "multimodal_jpeg_progressive_decode",
    "market_impact_fit", "pbo_cscv", "tokenizer_fertility",
    "packing_efficiency", "embedding_quantize", "dedup_incremental",
    "multimodal_png16_decode", "multimodal_jpeg_cmyk_decode",
    "multimodal_png_sub8_decode", "perplexity_budget_curves",
    "dedup_cluster_profile", "rv_signature", "weekday_effect",
    "ic_decay", "lsh_param_select", "lang_confusion",
    "multimodal_bmp_metadata", "multimodal_jpeg_metadata",
    "ngram_novelty", "pack_sequences", "permutation_entropy",
    "pmi_cooccurrence", "reading_ease", "rsi", "sadf", "sample_weights",
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


def test_round10_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND10_WINDOW


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
