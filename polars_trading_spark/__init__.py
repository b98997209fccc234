"""polars_trading_spark — a PySpark-native market-data analytics engine.

Re-implements the query & data-processing capabilities of the reference
``ngriffiths13/polars-trading`` (bar sampling, ML labeling, feature
engineering) as idiomatic Spark DataFrame pipelines, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.
"""

from polars_trading_spark._utils import release_persisted
from polars_trading_spark.config import Config, column_names
from polars_trading_spark.operators.asof import asof_join
from polars_trading_spark.operators.bars import (
    bar_groups,
    dollar_bars,
    range_bars,
    tick_bars,
    time_bars,
    volume_bars,
)
from polars_trading_spark.operators.dynamic_labels import (
    apply_profit_taking_stop_loss,
    daily_vol,
    get_triple_barrier_label,
    get_vertical_barrier_by_timedelta,
)
from polars_trading_spark.operators.ewm import ewm_std
from polars_trading_spark.operators.features import frac_diff, get_weights_ffd
from polars_trading_spark.operators.labels import (
    fixed_time_return,
    fixed_time_return_classification,
)
from polars_trading_spark.operators.sampling import cusum_filter
from polars_trading_spark.operators.sample_weights import (
    average_uniqueness,
    label_concurrency,
    return_attribution,
    sample_weights,
    time_decay,
)
from polars_trading_spark.operators.bet_sizing import (
    average_active_bets,
    bet_size_from_tstat,
)
from polars_trading_spark.operators.cross_section import (
    cross_sectional_zscore,
    lead_lag_corr,
    momentum_rank,
    rank_portfolio_backtest,
    rolling_beta,
    rolling_pair_correlation,
)
from polars_trading_spark.operators.covariance import ledoit_wolf_cov
from polars_trading_spark.operators.cv import cpcv_assign, purged_kfold
from polars_trading_spark.operators.data_quality import tick_quality, universe_summary
from polars_trading_spark.operators.drift import psi_drift
from polars_trading_spark.operators.execution import (
    almgren_chriss_schedule,
    vwap_slippage,
)
from polars_trading_spark.operators.backtest import (
    backtest_stats,
    drawdown_path,
    ma_crossover_signal,
    var_cvar,
)
from polars_trading_spark.operators.bootstrap import sequential_bootstrap
from polars_trading_spark.operators.entropy import lz_entropy, return_entropy
from polars_trading_spark.operators.feature_matrix import bar_feature_matrix
from polars_trading_spark.operators.imbalance import (
    imbalance_bars,
    imbalance_bars_adaptive,
    run_bars,
)
from polars_trading_spark.operators.mean_reversion import (
    cointegration_fit,
    ou_fit,
    spread_zscore_signal,
)
from polars_trading_spark.operators.microstructure import (
    corwin_schultz,
    sign_autocorr,
    microstructure_features,
    vpin,
)
from polars_trading_spark.operators.structural_breaks import (
    bde_cusum,
    csw_explosiveness,
    sadf,
)
from polars_trading_spark.operators.regime import (
    hurst_exponent,
    return_acf,
    variance_ratio,
)
from polars_trading_spark.operators.roll import roll_adjust
from polars_trading_spark.operators.seasonality import intraday_profile
from polars_trading_spark.operators.trend_scan import trend_scanning_labels
from polars_trading_spark.operators.volatility import bar_volatility, jump_test
from polars_trading_spark.session import get_spark

__all__ = [
    "Config",
    "column_names",
    "get_spark",
    "release_persisted",
    "time_bars",
    "tick_bars",
    "volume_bars",
    "dollar_bars",
    "range_bars",
    "bar_groups",
    "asof_join",
    "ewm_std",
    "daily_vol",
    "get_vertical_barrier_by_timedelta",
    "apply_profit_taking_stop_loss",
    "get_triple_barrier_label",
    "fixed_time_return",
    "fixed_time_return_classification",
    "frac_diff",
    "get_weights_ffd",
    "cusum_filter",
    "label_concurrency",
    "average_uniqueness",
    "return_attribution",
    "sample_weights",
    "time_decay",
    "imbalance_bars",
    "imbalance_bars_adaptive",
    "run_bars",
    "bar_volatility",
    "backtest_stats",
    "drawdown_path",
    "corwin_schultz",
    "bde_cusum",
    "sequential_bootstrap",
    "rolling_pair_correlation",
    "rolling_beta",
    "momentum_rank",
    "csw_explosiveness",
    "microstructure_features",
    "vpin",
    "trend_scanning_labels",
    "sadf",
    "return_entropy",
    "lz_entropy",
    "cpcv_assign",
    "purged_kfold",
    "bet_size_from_tstat",
    "average_active_bets",
    "bar_feature_matrix",
    "roll_adjust",
    "ou_fit",
    "intraday_profile",
    "cointegration_fit",
    "spread_zscore_signal",
    "ledoit_wolf_cov",
    "almgren_chriss_schedule",
    "vwap_slippage",
    "variance_ratio",
    "hurst_exponent",
    "ma_crossover_signal",
    "cross_sectional_zscore",
    "psi_drift",
    "tick_quality",
    "universe_summary",
    "jump_test",
    "sign_autocorr",
    "var_cvar",
    "rank_portfolio_backtest",
    "return_acf",
    "lead_lag_corr",
]

__version__ = "0.5.0"
