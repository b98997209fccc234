"""Dev harness for the dollar_bars DuckDB oracle.

Simulates the Spark applyInPandas semantics (operators/bars.py dollar_bars)
in pure Python over the same trades mapping, then runs the candidate
recursive-CTE oracle SQL in DuckDB and diffs the two row multisets.
"""

from __future__ import annotations

import math
import sys
from collections import defaultdict

import duckdb

B = 50_000_000.0

TRADES_CTE = """
  SELECT CAST(ts AS TIMESTAMP) AS ts_event,
         value + 0.01 AS price,
         10000 + (event_id % 90001) AS size,
         event_type AS symbol,
         event_id AS seq
  FROM events
"""

ORACLE = f"""
WITH RECURSIVE trades AS ({TRADES_CTE}),
ordered AS (
  SELECT symbol, CAST(ts_event AS DATE) AS d, ts_event, seq, price, size,
         row_number() OVER (PARTITION BY symbol, CAST(ts_event AS DATE)
                            ORDER BY ts_event, seq) AS rn
  FROM trades
  WHERE price IS NOT NULL
),
state AS (
  SELECT symbol, d, 1 AS rn, CAST(0.0 AS DOUBLE) AS c_in, CAST(0 AS BIGINT) AS gid_in
  FROM (SELECT DISTINCT symbol, d FROM ordered)
  UNION ALL
  SELECT symbol, d, rn, c_in, gid_in FROM (
    SELECT o.symbol AS symbol, o.d AS d, o.rn + 1 AS rn,
           CAST(ceil(({B} - s.c_in) / o.price) AS BIGINT) AS need1,
           CAST(ceil({B} / o.price) AS BIGINT) AS need_f,
           o.size - need1 AS rem,
           rem // need_f AS kfull,
           rem - kfull * need_f AS r,
           CASE WHEN o.size < need1 THEN s.c_in + o.size * o.price
                ELSE r * o.price END AS c_in,
           CASE WHEN o.size < need1 THEN s.gid_in
                ELSE s.gid_in + 1 + kfull END AS gid_in
    FROM state s
    JOIN ordered o ON o.symbol = s.symbol AND o.d = s.d AND o.rn = s.rn
  )
),
expanded AS (
  SELECT o.symbol, o.d, o.ts_event, o.seq, o.price,
         CAST(ceil(({B} - s.c_in) / o.price) AS BIGINT) AS need1,
         CAST(ceil({B} / o.price) AS BIGINT) AS need_f,
         o.size - need1 AS rem,
         rem // need_f AS kfull,
         rem - kfull * need_f AS r,
         CASE WHEN o.size < need1
              THEN [{{'b': s.gid_in, 'sh': o.size}}]
              ELSE [{{'b': s.gid_in, 'sh': need1}}]
                   || [{{'b': s.gid_in + j, 'sh': need_f}} for j in range(1, kfull + 1)]
                   || (CASE WHEN r > 0 THEN [{{'b': s.gid_in + 1 + kfull, 'sh': r}}]
                            ELSE [] END)
         END AS pcs
  FROM ordered o
  JOIN state s ON s.symbol = o.symbol AND s.d = o.d AND s.rn = o.rn
),
pieces AS (
  SELECT symbol, d, ts_event, seq, price, unnest(pcs) AS pc FROM expanded
)
SELECT symbol,
       min(ts_event) AS ts_event_start,
       max(ts_event) AS ts_event_end,
       first(price ORDER BY ts_event, seq) AS open,
       max(price) AS high,
       min(price) AS low,
       last(price ORDER BY ts_event, seq) AS close,
       CAST(sum(pc.sh) AS BIGINT) AS volume,
       round(sum(pc.sh * price) / sum(pc.sh), 4) AS vwap,
       CAST(count(*) AS INTEGER) AS n_trades
FROM pieces
GROUP BY symbol, d, pc.b
"""


def simulate(sf_dir: str):
    """Pure-Python replica of the Spark dollar_bars applyInPandas pass."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    rows = con.execute(
        f"WITH trades AS ({TRADES_CTE}) SELECT symbol, CAST(ts_event AS DATE), "
        "ts_event, seq, price, size FROM trades ORDER BY symbol, 2, ts_event, seq"
    ).fetchall()
    groups = defaultdict(list)
    for sym, d, t, seq, p, n in rows:
        groups[(sym, d)].append((t, seq, p, int(n)))

    bars = []
    for (sym, d), trades in groups.items():
        pieces = defaultdict(list)  # gid -> [(ts, seq, price, shares)]
        c, gid = 0.0, 0
        for t, seq, p, n in trades:
            while n > 0:
                need = math.ceil((B - c) / p)
                if need <= n:
                    pieces[gid].append((t, seq, p, need))
                    gid += 1
                    c = 0.0
                    n -= need
                else:
                    pieces[gid].append((t, seq, p, n))
                    c += n * p
                    n = 0
        for g in sorted(pieces):
            ps = pieces[g]
            vol = sum(sh for _, _, _, sh in ps)
            bars.append(
                (
                    sym,
                    min(t for t, *_ in ps),
                    max(t for t, *_ in ps),
                    ps[0][2],
                    max(p for _, _, p, _ in ps),
                    min(p for _, _, p, _ in ps),
                    ps[-1][2],
                    vol,
                    round(sum(p * sh for _, _, p, sh in ps) / vol, 4),
                    len(ps),
                )
            )
    con.close()
    return bars


def run_oracle(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    out = con.execute(ORACLE).fetchall()
    con.close()
    return out


def norm(rows):
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r) for r in rows
    )


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sim = norm(simulate(sf_dir))
    ora = norm(run_oracle(sf_dir))
    print(f"sim rows={len(sim)} oracle rows={len(ora)}")
    bad = [(a, b) for a, b in zip(sim, ora) if a != b]
    if len(sim) != len(ora) or bad:
        print("MISMATCH")
        for a, b in bad[:5]:
            print(" sim:", a)
            print(" ora:", b)
        sys.exit(1)
    print("MATCH")
