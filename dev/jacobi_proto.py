#!/usr/bin/env python3
"""DEV-ONLY feasibility probe for the q_embed_pca cyclic-Jacobi oracle.

Question (VERDICT round 10 ask #3): can DuckDB replay a FIXED-ORDER
cyclic Jacobi eigensolve on the 64x64 embedding covariance — bit-identical
to the JVM driver loop — fast enough to serve as the oracle?

Representation: recursive CTE, state = 64 rows (i, vals LIST of 64),
one Givens rotation per recursive iteration, rotation schedule (p, q)
joined from a generated table. The update replicates the engine's TWO-STEP
order (columns p,q for all rows, then rows p,q for all columns) so the
IEEE float sequence matches the Scala loop exactly.

Usage: python3 dev/jacobi_proto.py [sweeps]
"""
import sys
import math
import time

import duckdb
import numpy as np


def py_jacobi_fixed(a0, sweeps):
    """The engine-side loop (fixed sweeps, same skip rule), in python —
    float-for-float what the Scala driver does."""
    n = len(a0)
    a = [row[:] for row in a0]
    for _ in range(sweeps):
        for p in range(n):
            for q in range(p + 1, n):
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
                s = t * c
                for k in range(n):
                    akp, akq = a[k][p], a[k][q]
                    a[k][p] = c * akp - s * akq
                    a[k][q] = s * akp + c * akq
                for k in range(n):
                    apk, aqk = a[p][k], a[q][k]
                    a[p][k] = c * apk - s * aqk
                    a[q][k] = s * apk + c * aqk
    return [a[i][i] for i in range(n)]


def main():
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 64
    rng = np.random.RandomState(7)
    m = rng.randn(n, n)
    cov = (m + m.T) / 2.0
    # stable6 barrier: both engines would start from these exact doubles
    cov = np.round(cov, 6)

    rots = [(p, q) for p in range(n) for q in range(p + 1, n)]
    iters = sweeps * len(rots)
    con = duckdb.connect()
    con.execute("CREATE TABLE cov(i INT, vals DOUBLE[])")
    con.executemany("INSERT INTO cov VALUES (?, ?)",
                    [(i, list(map(float, cov[i]))) for i in range(n)])
    con.execute("CREATE TABLE sched(r INT, p INT, q INT)")
    con.executemany("INSERT INTO sched VALUES (?, ?, ?)",
                    [(r, p, q) for r, (p, q) in enumerate(rots)])

    # one rotation per recursive iteration; lists are 1-indexed in DuckDB
    # DuckDB 1.0 lambdas capture only columns of the SAME select's FROM, so
    # the rotation is a chain of plain derived tables: scalars first, then
    # the step-1 lists, then the final combine.
    sql = f"""
WITH RECURSIVE st(t, i, vals) AS (
  SELECT 0, i, vals FROM cov
  UNION ALL
  SELECT t + 1, i,
    CASE
      WHEN tt IS NULL THEN vals
      WHEN i = p THEN list_transform(range(1, {n + 1}),
                        m -> c * bp[m] - s * bq[m])
      WHEN i = q THEN list_transform(range(1, {n + 1}),
                        m -> s * bp[m] + c * bq[m])
      ELSE b_own END AS new_vals
  FROM (
    SELECT t, i, p, q, vals, tt, c, s,
      CASE WHEN tt IS NULL THEN vals ELSE
        list_transform(range(1, {n + 1}), m -> CASE
          WHEN m = p + 1 THEN c * vals[p + 1] - s * vals[q + 1]
          WHEN m = q + 1 THEN s * vals[p + 1] + c * vals[q + 1]
          ELSE vals[m] END) END AS b_own,
      CASE WHEN tt IS NULL THEN rowp ELSE
        list_transform(range(1, {n + 1}), m -> CASE
          WHEN m = p + 1 THEN c * rowp[p + 1] - s * rowp[q + 1]
          WHEN m = q + 1 THEN s * rowp[p + 1] + c * rowp[q + 1]
          ELSE rowp[m] END) END AS bp,
      CASE WHEN tt IS NULL THEN rowq ELSE
        list_transform(range(1, {n + 1}), m -> CASE
          WHEN m = p + 1 THEN c * rowq[p + 1] - s * rowq[q + 1]
          WHEN m = q + 1 THEN s * rowq[p + 1] + c * rowq[q + 1]
          ELSE rowq[m] END) END AS bq
    FROM (
      SELECT *,
        CASE WHEN tt IS NULL THEN 1.0
             ELSE 1.0 / sqrt(tt * tt + 1.0) END AS c,
        CASE WHEN tt IS NULL THEN 0.0
             ELSE tt * (1.0 / sqrt(tt * tt + 1.0)) END AS s
      FROM (
        SELECT *,
          CASE
            WHEN theta IS NULL THEN NULL
            WHEN theta = 0.0 THEN 1.0
            ELSE (CASE WHEN theta > 0 THEN 1.0 ELSE -1.0 END)
                 / (abs(theta) + sqrt(theta * theta + 1.0)) END AS tt
        FROM (
          SELECT *,
            CASE WHEN abs(rowp[q + 1]) <= 1e-15 THEN NULL ELSE
              (rowq[q + 1] - rowp[p + 1]) / (2.0 * rowp[q + 1]) END AS theta
          FROM (
            SELECT st.t, st.i, s.p, s.q, st.vals,
              max(CASE WHEN st.i = s.p THEN st.vals END) OVER () AS rowp,
              max(CASE WHEN st.i = s.q THEN st.vals END) OVER () AS rowq
            FROM st JOIN sched s ON s.r = st.t % {len(rots)}
            WHERE st.t < {iters}
          ) w
        ) th
      ) t2
    ) cs
  ) b
)
SELECT i, vals[i + 1] AS ev FROM st WHERE t = {iters} ORDER BY i
"""
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    dt = time.time() - t0
    got = [ev for _, ev in rows]
    expect = py_jacobi_fixed(cov.tolist(), sweeps)
    exact = sum(1 for g, e in zip(got, expect) if g == e)
    npev = np.sort(np.linalg.eigvalsh(cov))[::-1]
    gsort = np.sort(got)[::-1]
    maxerr = float(np.max(np.abs(gsort - npev)))
    print(f"sweeps={sweeps} iters={iters} duckdb={dt:.1f}s "
          f"bit_identical={exact}/64 max_err_vs_numpy={maxerr:.2e}")


if __name__ == "__main__":
    main()
