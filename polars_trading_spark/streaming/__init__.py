"""Structured Streaming variants of the bar operators."""

from polars_trading_spark.streaming.bars import (
    streaming_time_bars,
    streaming_volume_bars,
)

__all__ = ["streaming_time_bars", "streaming_volume_bars"]

from polars_trading_spark.streaming.ewm import streaming_ewm_std  # noqa: E402

__all__.append("streaming_ewm_std")

from polars_trading_spark.streaming.dedup import streaming_dedup_exact  # noqa: E402

__all__.append("streaming_dedup_exact")

from polars_trading_spark.streaming.cusum import streaming_cusum_filter  # noqa: E402

__all__.append("streaming_cusum_filter")

from polars_trading_spark.streaming.imbalance import (  # noqa: E402
    streaming_imbalance_bars,
    streaming_range_bars,
    streaming_run_bars,
)

__all__.append("streaming_imbalance_bars")
__all__.append("streaming_run_bars")
__all__.append("streaming_range_bars")

from polars_trading_spark.streaming.backtest import streaming_backtest_stats  # noqa: E402

__all__.append("streaming_backtest_stats")

from polars_trading_spark.streaming.packing import streaming_pack_sequences  # noqa: E402

__all__.append("streaming_pack_sequences")

from polars_trading_spark.streaming.sessions import (  # noqa: E402
    streaming_event_funnel,
    streaming_sessionize,
)
__all__.append("streaming_sessionize")
__all__.append("streaming_event_funnel")

from polars_trading_spark.streaming.hawkes import (  # noqa: E402
    streaming_hawkes_intensity,
)

__all__.append("streaming_hawkes_intensity")

from polars_trading_spark.streaming.rsi import streaming_rsi  # noqa: E402

__all__.append("streaming_rsi")

from polars_trading_spark.streaming.moments import (  # noqa: E402
    streaming_realized_moments,
    streaming_two_scale_rv,
)

__all__.append("streaming_realized_moments")
__all__.append("streaming_two_scale_rv")

from polars_trading_spark.streaming.ulcer import streaming_ulcer  # noqa: E402

__all__.append("streaming_ulcer")

from polars_trading_spark.streaming.acf import streaming_return_acf  # noqa: E402

__all__.append("streaming_return_acf")
from polars_trading_spark.streaming.indicators import (  # noqa: E402
    streaming_atr,
    streaming_macd,
)

__all__ += ["streaming_atr", "streaming_macd"]
from polars_trading_spark.streaming.indicators import (  # noqa: E402
    streaming_obv,
    streaming_stochastic,
)

__all__ += ["streaming_obv", "streaming_stochastic"]
from polars_trading_spark.streaming.indicators import streaming_bollinger  # noqa: E402

__all__.append("streaming_bollinger")
from polars_trading_spark.streaming.indicators import streaming_session_vwap  # noqa: E402

__all__.append("streaming_session_vwap")
from polars_trading_spark.streaming.indicators import streaming_donchian  # noqa: E402

__all__.append("streaming_donchian")
from polars_trading_spark.streaming.quality import streaming_hampel  # noqa: E402

__all__.append("streaming_hampel")
from polars_trading_spark.streaming.spread import streaming_spread_band  # noqa: E402

__all__.append("streaming_spread_band")
from polars_trading_spark.streaming.capacity import streaming_portfolio_capacity  # noqa: E402

__all__.append("streaming_portfolio_capacity")
from polars_trading_spark.streaming.rankbook import streaming_rank_portfolio_net  # noqa: E402
from polars_trading_spark.streaming.rankbook import streaming_rank_portfolio_tearsheet  # noqa: E402

__all__.append("streaming_rank_portfolio_net")
__all__.append("streaming_rank_portfolio_tearsheet")
from polars_trading_spark.streaming.execution import streaming_implementation_shortfall  # noqa: E402

__all__.append("streaming_implementation_shortfall")
from polars_trading_spark.streaming.signature import streaming_rv_signature  # noqa: E402

__all__.append("streaming_rv_signature")
from polars_trading_spark.streaming.incremental import (  # noqa: E402
    incremental_dedup_foreach_batch,
    seed_minhash_index,
    streaming_incremental_dedup,
)

__all__ += [
    "incremental_dedup_foreach_batch",
    "seed_minhash_index",
    "streaming_incremental_dedup",
]
