"""Physical-plan inspection helpers."""

from polars_trading_spark.plans.inspect import (
    plan_string,
    count_exchanges,
    count_keyed_exchanges,
    count_python_stages,
    has_unbounded_following_frame,
    scan_columns,
    unbounded_global_windows,
)

__all__ = [
    "plan_string",
    "count_exchanges",
    "count_keyed_exchanges",
    "count_python_stages",
    "has_unbounded_following_frame",
    "scan_columns",
    "unbounded_global_windows",
]
