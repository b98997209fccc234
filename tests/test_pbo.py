"""CSCV probability-of-backtest-overfitting (operators/pbo.py)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta
from itertools import combinations

import pytest

from polars_trading_spark.operators.pbo import pbo_cscv


def _bars(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts_event timestamp, close double"
    )


def _walk(sym, n, step):
    px, out = 100.0, []
    for i in range(n):
        px += step(i)
        out.append((sym, datetime(2024, 1, 1) + timedelta(minutes=15 * i), px))
    return out


def _reference(rows, S, lookbacks):
    """Pure-Python CSCV replay (same block math, floats via Python)."""
    by_sym = {}
    for sym, ts, c in rows:
        by_sym.setdefault(sym, []).append((ts, c))
    all_ts = sorted({ts for _, ts, _ in rows})
    nt = len(all_ts)
    block = {ts: int((i * S) / nt) for i, ts in enumerate(all_ts)}
    # per-strategy per-block moments, ts-ordered
    stats = {}
    for sym, series in by_sym.items():
        series.sort()
        cs = [c for _, c in series]
        for lb in lookbacks:
            sid = f"{sym}_{lb}"
            cur = stats.setdefault(sid, [[0, 0.0, 0.0] for _ in range(S)])
            for i in range(len(cs)):
                if i - 1 - lb < 0:
                    continue
                p1, pl = cs[i - 1], cs[i - 1 - lb]
                pos = 1.0 if p1 > pl else (-1.0 if p1 < pl else 0.0)
                r = pos * (cs[i] / p1 - 1)
                b = block[series[i][0]]
                cur[b][0] += 1
                cur[b][1] += r
                cur[b][2] += r * r
    def sharpe(n, s1, s2):
        if n < 2:
            return None
        var = (s2 - s1 * s1 / n) / (n - 1)
        if var <= 0:
            return None
        return (s1 / n) / math.sqrt(var)
    sids = sorted(stats)
    masks = []
    for comb in combinations(range(S), S // 2):
        masks.append(sum(1 << b for b in comb))
    masks.sort()
    n_below = 0
    logits, sis, sos = [], [], []
    n_valid = 0
    for m in masks:
        rows_m = []
        for sid in sids:
            blk = stats[sid]
            inn = sum(blk[b][0] for b in range(S) if (m >> b) & 1)
            is1 = sum(blk[b][1] for b in range(S) if (m >> b) & 1)
            is2 = sum(blk[b][2] for b in range(S) if (m >> b) & 1)
            tn = sum(blk[b][0] for b in range(S))
            t1 = sum(blk[b][1] for b in range(S))
            t2 = sum(blk[b][2] for b in range(S))
            rows_m.append(
                (sid, sharpe(inn, is1, is2), sharpe(tn - inn, t1 - is1, t2 - is2))
            )
        cands = [r for r in rows_m if r[1] is not None and r[2] is not None]
        if not cands:
            continue
        sel = max(cands, key=lambda r: (r[1], r[0]))
        r_cnt = sum(1 for r in rows_m if r[2] is not None and r[2] <= sel[2])
        nr = sum(1 for r in rows_m if r[2] is not None)
        if nr < 1:
            continue
        n_valid += 1
        om = r_cnt / (nr + 1)
        logits.append(math.log(om / (1 - om)))
        sis.append(sel[1])
        sos.append(sel[2])
        if 2 * r_cnt < nr + 1:
            n_below += 1
    return {
        "n_strategies": len(sids),
        "n_combos": n_valid,
        "pbo": n_below / n_valid,
        "mean_logit": sum(logits) / n_valid,
        "mean_sel_is_sharpe": sum(sis) / n_valid,
        "mean_sel_oos_sharpe": sum(sos) / n_valid,
    }


def test_pbo_matches_python_reference(spark):
    rows = []
    for si, sym in enumerate(("A", "B", "C")):
        rows += _walk(
            sym,
            96,
            lambda i, si=si: (((i * 2654435761 + si * 97) % 17) - 8) * 0.05,
        )
    S, lbs = 4, (1, 3)
    out = pbo_cscv(
        _bars(spark, rows), n_blocks=S, lookbacks=lbs
    ).collect()[0]
    ref = _reference(rows, S, lbs)
    assert out["n_strategies"] == ref["n_strategies"]
    assert out["n_blocks"] == S
    assert out["n_combos"] == ref["n_combos"]
    assert out["pbo"] == pytest.approx(ref["pbo"], abs=1e-12)
    for k in ("mean_logit", "mean_sel_is_sharpe", "mean_sel_oos_sharpe"):
        assert out[k] == pytest.approx(ref[k], rel=1e-9), k


def test_pbo_detects_robust_vs_noise(spark):
    # one symbol with a strong persistent uptrend (momentum wins in AND
    # out of sample) plus noise symbols: the selected strategy keeps
    # its edge OOS -> low PBO
    rows = _walk("UP", 160, lambda i: 0.6 + (((i * 7) % 5) - 2) * 0.02)
    for si, sym in enumerate(("N1", "N2")):
        rows += _walk(
            sym, 160, lambda i, si=si: (((i * 2654435761 + si * 31) % 13) - 6) * 0.21
        )
    good = pbo_cscv(_bars(spark, rows), n_blocks=6, lookbacks=(1, 2)).collect()[0]
    assert good["pbo"] <= 0.25
    assert good["mean_logit"] > 0
    # pure noise: selection generalizes at chance level -> PBO well
    # above the robust case
    import random

    rng = random.Random(20240816)
    noise = []
    for si in range(6):
        noise += _walk(f"S{si}", 160, lambda i: rng.uniform(-0.5, 0.5))
    rand = pbo_cscv(_bars(spark, noise), n_blocks=6, lookbacks=(1, 2)).collect()[0]
    assert rand["pbo"] >= good["pbo"] + 0.15


def test_pbo_validation(spark):
    df = _bars(spark, _walk("A", 10, lambda i: 0.1))
    with pytest.raises(ValueError):
        pbo_cscv(df, n_blocks=5)
    with pytest.raises(ValueError):
        pbo_cscv(df, n_blocks=18)
    with pytest.raises(ValueError):
        pbo_cscv(df, lookbacks=())
    with pytest.raises(ValueError):
        pbo_cscv(df, lookbacks=(0,))
