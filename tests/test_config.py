from __future__ import annotations

import pytest

from polars_trading_spark import Config, column_names


def test_defaults():
    assert column_names.timestamp == "timestamp"
    assert column_names.price == "price"
    assert column_names.symbol == "symbol"
    assert column_names.size == "size"


def test_global_set_and_reset():
    Config.set(timestamp_column="ts_event", price_column="px")
    assert column_names.timestamp == "ts_event"
    assert column_names.price == "px"
    assert column_names.symbol == "symbol"
    Config.reset()
    assert column_names.timestamp == "timestamp"


def test_context_manager_scoping():
    Config.set(price_column="px_global")
    with Config(price_column="px_scoped", symbol_column="ticker"):
        assert column_names.price == "px_scoped"
        assert column_names.symbol == "ticker"
    assert column_names.price == "px_global"
    assert column_names.symbol == "symbol"


def test_decorator_scoping():
    @Config(size_column="qty")
    def inner():
        return column_names.size

    assert inner() == "qty"
    assert column_names.size == "size"


def test_column_key_aliases():
    Config.set(open_column="o")
    assert Config.get("open") == "o"
    assert Config.get("open_column") == "o"
    assert column_names.open_column == "o"


def test_named_setters():
    Config.set_high_column("hi")
    assert column_names.high == "hi"


def test_invalid_key_raises():
    with pytest.raises(ValueError):
        Config.set(nonsense_column="x")
