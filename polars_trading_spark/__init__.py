"""polars_trading_spark — a PySpark-native market-data analytics engine.

Re-implements the query & data-processing capabilities of the reference
``ngriffiths13/polars-trading`` (bar sampling, ML labeling, feature
engineering) as idiomatic Spark DataFrame pipelines, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.
"""

from polars_trading_spark.config import Config, column_names
from polars_trading_spark.operators.bars import (
    bar_groups,
    dollar_bars,
    tick_bars,
    time_bars,
    volume_bars,
)
from polars_trading_spark.session import get_spark

__all__ = [
    "Config",
    "column_names",
    "get_spark",
    "time_bars",
    "tick_bars",
    "volume_bars",
    "dollar_bars",
    "bar_groups",
]

__version__ = "0.1.0"
