"""Roll-gap adjustment for spliced price series (AFML 2.4: the futures
roll / "ETF trick").

A continuous price series stitched from expiring contracts (or any
re-based instrument) carries artificial jumps at each roll: the last
price of the old contract and the first price of the new one differ by
carry/basis, not by tradable P&L.  Labeling or return features computed
across a roll boundary are wrong unless the series is adjusted.  The
reference stops at bar sampling (polars_trading/bars.py); this operator
adds the standard adjustment step that precedes it on real futures data.

``roll_adjust`` takes the trade/bar frame plus a small per-symbol table
of roll timestamps and emits an ``adj_price`` column:

* ``method="backward"`` (default): the latest segment keeps its true
  price; earlier segments are shifted UP/DOWN by the sum of all *later*
  roll gaps, so the series is continuous and ends at the real price.
* ``method="forward"``: the first segment is true; later segments shift.
* ``method="ratio"``: multiplicative (log-gap) backward adjustment —
  preserves returns instead of price differences (the right choice when
  downstream features are log returns).

The gap at a boundary is ``first price at/after roll_ts  −  last price
strictly before`` (per symbol); boundaries that precede the first trade
or follow the last contribute a zero gap.  Two boundaries with no
trades between them see the same flanking prices and therefore
double-count the single observed jump — pass boundaries aligned with
the data (e.g. first tick per contract week), which is how real roll
calendars behave.

Distributed shape: boundaries are unioned into the trade stream and
everything — flanking prices, per-boundary gap, running and total gap —
is window algebra over ONE per-symbol partitioning: a single shuffle,
zero joins, zero Python.  The roll table is tiny (contracts per symbol)
but never needs broadcasting because it rides the same exchange as the
trades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_trading_spark._utils import SEQ_COL, with_seq
from polars_trading_spark.config import column_names

__all__ = ["roll_adjust"]

_METHODS = ("backward", "forward", "ratio")
_KIND = "__roll_kind"  # 0 = boundary (sorts first at equal ts), 1 = trade


def roll_adjust(
    df: DataFrame,
    roll_points: DataFrame,
    *,
    method: str = "backward",
    roll_ts_col: str = "roll_ts",
) -> DataFrame:
    """Adjust ``price`` for roll gaps at the given per-symbol boundaries.

    ``roll_points`` must have the symbol column (per ``column_names``)
    and ``roll_ts_col``.  Returns the trade rows with ``adj_price``
    appended; input column names follow the ``Config`` convention.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")

    ts, price, symbol = (
        column_names.timestamp,
        column_names.price,
        column_names.symbol,
    )

    had_seq = SEQ_COL in df.columns
    trades = with_seq(df).withColumn(_KIND, F.lit(1))
    bounds = roll_points.select(
        F.col(symbol),
        F.col(roll_ts_col).alias(ts),
        F.lit(-1).cast("long").alias(SEQ_COL),
        F.lit(0).alias(_KIND),
    )
    u = trades.unionByName(bounds, allowMissingColumns=True)

    # One partitioning for every window below: boundary rows sort before
    # trades at the same timestamp, so a trade AT roll_ts belongs to the
    # new segment.
    w = Window.partitionBy(symbol).orderBy(ts, _KIND, SEQ_COL)
    p = F.when(F.col(_KIND) == 1, F.col(price))
    prev_p = F.last(p, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # "First trade at/after" via the DESCENDING running frame, not a
    # [current, unbounded following] frame — Spark's
    # UnboundedFollowingWindowFunctionFrame re-aggregates the remaining
    # rows per row (O(n²) per partition); the reversed ordering makes it
    # a plain O(n) running last() (same rewrite as operators/asof.py).
    w_desc = Window.partitionBy(symbol).orderBy(
        F.desc(ts), F.desc(_KIND), F.desc(SEQ_COL)
    )
    next_p = F.last(p, ignorenulls=True).over(
        w_desc.rowsBetween(Window.unboundedPreceding, 0)
    )
    at_bound = F.col(_KIND) == 0
    gap = F.when(
        at_bound & prev_p.isNotNull() & next_p.isNotNull(), next_p - prev_p
    ).otherwise(F.lit(0.0))
    lgap = F.when(
        at_bound & (prev_p > 0) & (next_p > 0), F.log(next_p / prev_p)
    ).otherwise(F.lit(0.0))

    u = u.withColumn("__gap", gap).withColumn("__lgap", lgap)
    cum = Window.partitionBy(symbol).orderBy(ts, _KIND, SEQ_COL).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # The partition total is taken as the LAST running value, not an
    # unordered sum(): a plain aggregate sums in tree/partial order,
    # which differs between engines at the ulp level — deriving it from
    # the same sequential fold keeps the adjustment bit-identical to the
    # differential oracle (and to any re-run with different parallelism).
    full = Window.partitionBy(symbol).orderBy(ts, _KIND, SEQ_COL).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    u = u.withColumn("__cg", F.sum("__gap").over(cum)).withColumn(
        "__cl", F.sum("__lgap").over(cum)
    )
    u = u.withColumn("__tg", F.last("__cg").over(full)).withColumn(
        "__tl", F.last("__cl").over(full)
    )

    if method == "forward":
        adj = F.col(price) - F.col("__cg")
    elif method == "backward":
        adj = F.col(price) + (F.col("__tg") - F.col("__cg"))
    else:  # ratio: multiplicative backward — returns are preserved
        adj = F.col(price) * F.exp(F.col("__tl") - F.col("__cl"))

    out = u.where(F.col(_KIND) == 1).withColumn("adj_price", adj)
    drop = [_KIND, "__gap", "__lgap", "__cg", "__tg", "__cl", "__tl"]
    if not had_seq:
        # with_seq synthesized the tiebreaker — don't leak it into the
        # documented output schema (trade rows + adj_price only).
        drop.append(SEQ_COL)
    return out.drop(*drop)
