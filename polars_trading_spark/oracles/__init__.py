"""Per-domain oracle modules; imported in pinned order by polars_trading_spark.registry."""
