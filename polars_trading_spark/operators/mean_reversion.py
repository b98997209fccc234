"""Ornstein-Uhlenbeck / AR(1) mean-reversion fit per symbol.

AFML ch.13 frames optimal trading rules around an O-U price process;
the practical first step on real data is estimating the discrete AR(1)
form per instrument:

    x_t = a + phi * x_{t-1} + eps_t,   x = log price

from which the O-U quantities follow in closed form:

* ``phi``        — AR(1) slope (mean-reversion speed; < 1 reverts)
* ``mu``         — long-run equilibrium level ``a / (1 - phi)``
* ``half_life``  — ``-ln 2 / ln phi`` observations to close half the
                   gap to equilibrium (the classic pairs-trading filter:
                   trade only instruments with a short half-life)
* ``sigma``      — residual std (per-step innovation scale)
* ``sigma_eq``   — stationary std ``sigma / sqrt(1 - phi^2)`` (entry/
                   exit band width in O-U optimal-rule grids)

Distributed shape: one lag window per symbol, then ONE hash aggregate
of explicit sums (n, Σx, Σy, Σxx, Σyy, Σxy) — the OLS solve is scalar
algebra on aggregate outputs, so a million-symbol universe is one
shuffle regardless of history length.  Explicit sums (not covar_samp)
keep null handling engine-identical for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ou_fit"]


def ou_fit(
    bars: DataFrame,
    *,
    symbol_col: str = "symbol",
    ts_col: str = "ts_event_start",
    close_col: str = "close",
    use_log: bool = True,
) -> DataFrame:
    """Per-symbol AR(1)/O-U fit of (log) close prices.

    Returns one row per symbol: ``symbol, n_obs, phi, mu, half_life,
    sigma, sigma_eq``.  ``n_obs`` counts the (x_{t-1}, x_t) pairs; fits
    with fewer than 3 pairs or a degenerate regressor emit nulls.
    ``half_life``/``sigma_eq`` are null unless ``0 < phi < 1`` (no
    mean reversion to speak of otherwise).
    """
    c = F.col(close_col).cast("double")
    x = F.log(c) if use_log else c
    order = Window.partitionBy(symbol_col).orderBy(ts_col)
    pairs = bars.select(
        F.col(symbol_col), x.alias("__y"), F.lag(x).over(order).alias("__x")
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    g = pairs.groupBy(symbol_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )

    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    den = n * sxx - sx * sx
    ok = (F.col("__n") >= 3) & (den > 0)
    phi = F.when(ok, (n * sxy - sx * sy) / den)
    a = F.when(ok, (sy - phi * sx) / n)
    # SSE via aggregate sums only: Σ(y - a - phi·x)²
    sse = syy + n * a * a + phi * phi * sxx - 2 * a * sy - 2 * phi * sxy + 2 * a * phi * sx
    sigma = F.when(ok & (F.col("__n") > 3), F.sqrt(F.greatest(sse, F.lit(0.0)) / (n - 2)))
    reverts = ok & (phi > 0) & (phi < 1)
    mu = F.when(ok & (phi != 1.0), a / (1 - phi))
    half_life = F.when(reverts, -F.log(F.lit(2.0)) / F.log(phi))
    sigma_eq = F.when(reverts, sigma / F.sqrt(1 - phi * phi))

    return g.select(
        F.col(symbol_col),
        F.col("__n").cast("long").alias("n_obs"),
        phi.alias("phi"),
        mu.alias("mu"),
        half_life.alias("half_life"),
        sigma.alias("sigma"),
        sigma_eq.alias("sigma_eq"),
    )
