from __future__ import annotations

from polars_trading_spark import Config, time_bars, volume_bars, daily_vol
from polars_trading_spark.sources.synthetic import generate_trade_data


def test_generator_deterministic_and_usable(spark):
    a = generate_trade_data(spark, 500, 3).collect()
    b = generate_trade_data(spark, 500, 3).collect()
    assert a == b
    assert len({r["symbol"] for r in a}) == 3
    assert all(1.0 <= r["price"] <= 100.0 for r in a)
    assert all(10_000 <= r["size"] <= 100_000 for r in a)


def test_operators_run_on_generated_trades(spark):
    df = generate_trade_data(spark, 2_000, 4)
    with Config(timestamp_column="ts_event"):
        assert time_bars(df, bar_size="1h").count() > 0
        assert volume_bars(df, bar_size=1_000_000).count() > 0
        assert daily_vol(df, span=20).count() == 2_000
