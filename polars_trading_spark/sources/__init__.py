"""Source readers: Parquet tables and the events→trades mapping."""

from polars_trading_spark.sources.tables import read_table, trades_from_events, TRADES_CTE

__all__ = ["read_table", "trades_from_events", "TRADES_CTE"]
