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
# oracle at sf0.01).  The round-by-round front lists and gate history
# live in oracles/rotation.py (pure data); tests/test_registry_order.py
# asserts every never-gated registration sits inside the active window.
#
# KEEP THIS BLOCK AT THE VERY END OF THE FILE — the rotation runs after
# every domain module has registered; new queries (and new domain module
# imports) belong ABOVE it and must ALSO be added to the active front in
# oracles/rotation.py so they get a driver row in the current round.
# ==========================================================================


def _rotate_front(front: list) -> None:
    missing = [n for n in front if n not in QUERIES]
    if missing:  # fail loudly at import if the list drifts from the registry
        raise KeyError(f"rotation names not registered: {missing}")
    ordered = front + [n for n in QUERIES if n not in set(front)]
    items = [(n, QUERIES[n]) for n in ordered]
    QUERIES.clear()
    QUERIES.update(items)


from polars_trading_spark.oracles.rotation import ACTIVE_FRONT  # noqa: E402

_rotate_front(ACTIVE_FRONT)
