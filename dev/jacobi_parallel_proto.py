#!/usr/bin/env python3
"""DEV-ONLY: round-robin PARALLEL cyclic Jacobi as the q_embed_pca oracle.

The sequential recursive-CTE replay works (64/64 bit-identical) but costs
~74 s: 12,096 recursive iterations at ~6 ms planner overhead each. The
round-robin (circle-method) parallel ordering applies 32 DISJOINT
rotations per round — 63 rounds/sweep, 378 iterations for 6 sweeps —
with a deterministic two-phase update: ALL rotation angles come from the
pre-round matrix; phase 1 rewrites the paired COLUMNS (a per-row map —
column updates only read entries of the same row); phase 2 rewrites the
paired ROWS on the column-updated matrix. Disjoint pairs touch disjoint
columns in phase 1 and disjoint rows in phase 2, so every entry gets
exactly one update per phase and the float sequence is order-free within
a phase: bit-reproducible across engines.

Schedule (circle method, n=64, m=63): round r pairs (r % m, m) with the
fixed index m=63, plus ((r+k) % m, (r-k+m) % m) for k=1..31; 63 rounds
cover all C(64,2) pairs exactly once.

Measured (2026-08-15): sweeps=6 iters=378 duckdb=5.4s bit_identical=64/64
sql_err=2.54e-08 py_err=2.54e-08 — shipped as the q_embed_pca oracle.

Usage: python3 dev/jacobi_parallel_proto.py [sweeps]
"""
import math
import sys
import time

import duckdb
import numpy as np


def round_robin(n):
    m = n - 1
    rounds = []
    for r in range(m):
        pairs = [(r % m, m)]
        for k in range(1, n // 2):
            i = (r + k) % m
            j = (r - k + m) % m
            pairs.append((min(i, j), max(i, j)))
        rounds.append(pairs)
    return rounds


def py_parallel_jacobi(a0, sweeps):
    n = len(a0)
    a = [row[:] for row in a0]
    rounds = round_robin(n)
    for _ in range(sweeps):
        for rnd in rounds:
            params = []
            for p, q in rnd:
                apq = a[p][q]
                if abs(apq) <= 1e-15:
                    continue
                theta = (a[q][q] - a[p][p]) / (2.0 * apq)
                if theta == 0.0:
                    t = 1.0
                else:
                    t = (1.0 if theta > 0 else -1.0) / (
                        abs(theta) + math.sqrt(theta * theta + 1.0))
                c = 1.0 / math.sqrt(t * t + 1.0)
                params.append((p, q, c, t * c))
            for p, q, c, s in params:       # phase 1: columns p,q, all rows
                for k in range(n):
                    akp, akq = a[k][p], a[k][q]
                    a[k][p] = c * akp - s * akq
                    a[k][q] = s * akp + c * akq
            for p, q, c, s in params:       # phase 2: rows p,q, all cols
                for k in range(n):
                    apk, aqk = a[p][k], a[q][k]
                    a[p][k] = c * apk - s * aqk
                    a[q][k] = s * apk + c * aqk
    return [a[i][i] for i in range(n)]


def main():
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n = 64
    m = n - 1
    rng = np.random.RandomState(7)
    mat = rng.randn(n, n)
    cov = np.round((mat + mat.T) / 2.0, 6)

    iters = sweeps * m
    con = duckdb.connect()
    con.execute("CREATE TABLE cov(i INT, vals DOUBLE[])")
    con.executemany("INSERT INTO cov VALUES (?, ?)",
                    [(i, list(map(float, cov[i]))) for i in range(n)])

    d1 = n + 1
    sql = f"""
WITH RECURSIVE
-- circle-method schedule: (round, idx) -> (p, q, side) for every index
pr AS (
  SELECT r.range AS r,
    CASE WHEN k.range = 0 THEN r.range % {m}
         ELSE least((r.range + k.range) % {m}, (r.range - k.range + {m}) % {m}) END AS p,
    CASE WHEN k.range = 0 THEN {m}
         ELSE greatest((r.range + k.range) % {m}, (r.range - k.range + {m}) % {m}) END AS q
  FROM range(0, {m}) r, range(0, {n // 2}) k
),
psched AS (
  SELECT r, p AS idx, p, q, 0 AS sd FROM pr
  UNION ALL
  SELECT r, q, p, q, 1 FROM pr
),
st(t, i, vals) AS (
  SELECT 0, i, vals FROM cov
  UNION ALL
  SELECT t + 1, i,
    CASE WHEN c IS NULL THEN ph1
         WHEN i = p THEN list_transform(range(1, {d1}), m -> c * bp[m] - s * bq[m])
         ELSE list_transform(range(1, {d1}), m -> s * bp[m] + c * bq[m]) END
  FROM (
    SELECT t, i, p, q, c, s, ph1,
      max(CASE WHEN i = p THEN ph1 END) OVER (PARTITION BY p) AS bp,
      max(CASE WHEN i = q THEN ph1 END) OVER (PARTITION BY p) AS bq
    FROM (
      SELECT t, i, p, q, c, s,
        list_transform(range(1, {d1}), m -> CASE
          WHEN cl[m] IS NULL THEN vals[m]
          WHEN sdl[m] = 0 THEN cl[m] * vals[m] - sl[m] * vals[ptl[m] + 1]
          ELSE sl[m] * vals[ptl[m] + 1] + cl[m] * vals[m] END) AS ph1
      FROM (
        SELECT t, i, p, q, c, s, vals,
          list_transform(prm, e -> e.cc) AS cl,
          list_transform(prm, e -> e.ss) AS sl,
          list_transform(prm, e -> e.pt) AS ptl,
          list_transform(prm, e -> e.sd) AS sdl
        FROM (
          SELECT *, list_sort(list(struct_pack(ix := i, cc := c, ss := s,
            pt := CASE WHEN sd = 0 THEN q ELSE p END, sd := sd)) OVER ()) AS prm
          FROM (
            SELECT t, i, p, q, vals, sd,
              CASE WHEN tt IS NULL THEN NULL
                   ELSE 1.0 / sqrt(tt * tt + 1.0) END AS c,
              CASE WHEN tt IS NULL THEN NULL
                   ELSE tt * (1.0 / sqrt(tt * tt + 1.0)) END AS s
            FROM (
              SELECT t, i, p, q, vals, sd,
                CASE WHEN abs(apq) <= 1e-15 THEN NULL
                     WHEN (aqq - app) / (2.0 * apq) = 0.0 THEN 1.0
                     ELSE (CASE WHEN (aqq - app) / (2.0 * apq) > 0 THEN 1.0 ELSE -1.0 END)
                          / (abs((aqq - app) / (2.0 * apq))
                             + sqrt(((aqq - app) / (2.0 * apq)) * ((aqq - app) / (2.0 * apq)) + 1.0)) END AS tt
              FROM (
                SELECT st.t, st.i, ps.p, ps.q, st.vals, ps.sd,
                  max(CASE WHEN st.i = ps.p THEN st.vals[ps.p + 1] END)
                    OVER (PARTITION BY ps.p) AS app,
                  max(CASE WHEN st.i = ps.q THEN st.vals[ps.q + 1] END)
                    OVER (PARTITION BY ps.p) AS aqq,
                  max(CASE WHEN st.i = ps.p THEN st.vals[ps.q + 1] END)
                    OVER (PARTITION BY ps.p) AS apq
                FROM st JOIN psched ps ON ps.r = st.t % {m} AND ps.idx = st.i
                WHERE st.t < {iters}
              ) w
            ) th
          ) cs
        ) pk
      ) arr
    ) ph1t
  ) ph2
)
SELECT i, vals[i + 1] AS ev FROM st WHERE t = {iters} ORDER BY i
"""
    t0 = time.time()
    try:
        rows = con.execute(sql).fetchall()
    except Exception as e:
        print("SQL FAIL:", str(e)[:500])
        return
    dt = time.time() - t0
    got = [ev for _, ev in rows]
    expect = py_parallel_jacobi(cov.tolist(), sweeps)
    exact = sum(1 for g, e in zip(got, expect) if g == e)
    npev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    maxerr = float(np.max(np.abs(np.sort(got)[::-1] - npev)))
    pyerr = float(np.max(np.abs(np.sort(expect)[::-1] - npev)))
    print(f"sweeps={sweeps} iters={iters} duckdb={dt:.1f}s "
          f"bit_identical={exact}/64 sql_err={maxerr:.2e} py_err={pyerr:.2e}")


if __name__ == "__main__":
    main()
