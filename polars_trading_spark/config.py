"""Column-name configuration layer.

Mirrors the semantics of the reference's ``Config`` / ``column_names``
(reference: polars_trading/config.py:21-173): a process-global +
context-scoped mapping from logical column roles (timestamp, price,
size, symbol, ohlc) to physical column names.  This is pure driver-side
Python — it only resolves name strings before a Spark plan is built —
so there is no Spark involvement at all.

Usage::

    from polars_trading_spark import Config, column_names

    Config.set(timestamp_column="ts_event")
    column_names.timestamp            # -> "ts_event"

    with Config(price_column="px"):
        column_names.price            # -> "px" inside the scope
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Any

__all__ = ["Config", "column_names", "DEFAULT_COLUMN_NAMES"]

# Logical role -> default physical column name.
DEFAULT_COLUMN_NAMES: dict[str, str] = {
    "open": "open",
    "high": "high",
    "low": "low",
    "close": "close",
    "size": "size",
    "timestamp": "timestamp",
    "symbol": "symbol",
    "price": "price",
}

_VALID_KEYS = {f"{role}_column" for role in DEFAULT_COLUMN_NAMES}

_ctx: ContextVar[dict[str, str] | None] = ContextVar(
    "polars_trading_spark_config", default=None
)


def _current() -> dict[str, str]:
    return dict(_ctx.get() or {})


def _normalize_key(key: str) -> tuple[str, str]:
    """Return (config_key, role) for either 'price' or 'price_column'."""
    if key.endswith("_column"):
        return key, key[: -len("_column")]
    return f"{key}_column", key


class Config(contextlib.ContextDecorator):
    """Set column-name options globally, or scoped via ``with``/decorator."""

    def __init__(self, **options: str) -> None:
        bad = set(options) - _VALID_KEYS
        if bad:
            raise ValueError(
                f"unknown Config option(s) {sorted(bad)}; valid: {sorted(_VALID_KEYS)}"
            )
        self._options = options
        self._token: Any = None

    def __enter__(self) -> "Config":
        self._token = _ctx.set({**_current(), **self._options})
        return self

    def __exit__(self, *exc: object) -> None:
        if self._token is not None:
            _ctx.reset(self._token)
            self._token = None

    @classmethod
    def set(cls, **options: str) -> type["Config"]:
        """Set options globally (process-wide for the current context)."""
        bad = set(options) - _VALID_KEYS
        if bad:
            raise ValueError(
                f"unknown Config option(s) {sorted(bad)}; valid: {sorted(_VALID_KEYS)}"
            )
        _ctx.set({**_current(), **options})
        return cls

    @classmethod
    def get(cls, key: str) -> str:
        config_key, role = _normalize_key(key)
        return _current().get(config_key, DEFAULT_COLUMN_NAMES.get(role, ""))

    @classmethod
    def reset(cls) -> type["Config"]:
        _ctx.set({})
        return cls


def _make_setter(role: str):
    def setter(cls: type[Config], name: str) -> type[Config]:
        return cls.set(**{f"{role}_column": name})

    setter.__name__ = f"set_{role}_column"
    setter.__doc__ = f"Set the default name for the '{role}' column."
    return classmethod(setter)


for _role in DEFAULT_COLUMN_NAMES:
    setattr(Config, f"set_{_role}_column", _make_setter(_role))


class ColumnNames:
    """Dynamic attribute access to the currently-configured column names."""

    def __getattr__(self, name: str) -> str:
        config_key, role = _normalize_key(name)
        if role not in DEFAULT_COLUMN_NAMES:
            raise AttributeError(name)
        return _current().get(config_key, DEFAULT_COLUMN_NAMES[role])


column_names = ColumnNames()
