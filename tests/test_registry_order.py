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

# The round-11 driver gate window: the 7 round-11 registrations (YCCK
# JPEG, animated GIF, progressive-YCCK, subsampled-progressive 4:2:0,
# restart-marker + non-interleaved JPEG, domain_cap — never
# driver-checked), `bpe_encode` (round 10's
# only red row, re-registered with a driver-sortable checksum output to
# flip err -> PASS), then the 42 stalest backfill names (latest driver
# row round 6, then round-7 alphabetical).
_ROUND11_WINDOW = [
    "multimodal_jpeg_ycck_decode", "multimodal_gif_animated_decode",
    "multimodal_jpeg_prog_ycck_decode", "multimodal_jpeg_prog420_decode",
    "multimodal_jpeg_restart_decode", "domain_cap",
    "multimodal_jpeg_noninterleaved_decode",
    "bpe_encode",
    # -- backfill: latest driver row r6 --
    "similarity_topk", "similarity_topk_ivf_kmeans", "tick_bars",
    "tick_quality", "time_bars", "time_bars_compound_duration",
    "triple_barrier", "triple_barrier_meta", "universe_summary",
    "upsample_ffill", "vertical_barrier", "volume_bars", "vwap_slippage",
    "winnow_dup_pairs", "winnow_fingerprints", "zipf_fit",
    # -- backfill: latest driver row r7, alphabetical --
    "ann_recall", "bar_volatility", "centroid_similarity",
    "cluster_representatives", "cointegration", "corpus_filter",
    "corpus_split", "corpus_stats", "corwin_schultz", "cpcv_assign",
    "csw_explosiveness", "dedup_clusters", "dedup_embedding_cosine",
    "dedup_ngram_jaccard", "dedup_recall", "dedup_simhash",
    "embedding_cohesion", "event_study_car", "gumbel_topk",
    "hard_negatives", "hurst", "imbalance_bars", "kalman_hedge",
    "key_skew", "microstructure", "multimodal_frame_sample",
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


def test_round11_gate_window_is_first_50():
    assert list(QUERIES)[:50] == _ROUND11_WINDOW


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
