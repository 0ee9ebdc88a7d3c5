#!/usr/bin/env python3
"""DEV-ONLY prototype of the unrolled-Lloyd CTE oracles (round 8).

Builds the k-means CTE prefix exactly as SparkEntry.lloydCtes will, runs the
four k-means-family oracles in DuckDB, and diffs against a Verify dump.
Usage: python3 dev/lloyd_proto.py /root/testdata/sf0.01 /tmp/ivf_out
"""
import sys
import duckdb
import pandas as pd

K = 16
DIM = 64


def lloyd_ctes(k=K, dim=DIM, updates=2):
    """CTE prefix ending in cf (final centroids) and af (final assignment).

    Mirrors IvfOps.trainIndex(k, iters=3): init = first k vectors by id,
    `updates` = iters-1 Lloyd updates with stable6-rounded means and
    empty-cell carryover, then one final assignment under cf.
    Score = |c|^2 - 2<v,c>, argmin ties to lower cid (ROW_NUMBER).
    """
    parts = [
        f"e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c "
        f"FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))",
    ]
    prev = "c0"
    for t in range(updates):
        a, u, c = f"a{t}", f"u{t}", f"c{t+1}"
        parts.append(
            f"{a} AS (SELECT vec_id, v FROM ("
            f"SELECT e.vec_id, e.v, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            f"list_sum(list_transform(c.c, y -> y * y)) - 2 * list_sum(list_transform(range(1, {dim + 1}), i -> c.c[i] * e.v[i])), c.cid) AS rn, "
            f"c.cid AS acid FROM e CROSS JOIN {prev} c) WHERE rn = 1".replace("SELECT vec_id, v FROM (", "SELECT vec_id, v, acid AS cid FROM (")
            + ")"
        )
        parts.append(
            f"{u} AS (SELECT cid, list(m ORDER BY i) AS c FROM ("
            f"SELECT cid, i, CAST(round(CAST(avg(v[CAST(i AS INTEGER)]) AS DECIMAL(20,8)), 6) AS DOUBLE) AS m "
            f"FROM {a}, range(1, {dim + 1}) t(i) GROUP BY cid, i) GROUP BY cid)"
        )
        parts.append(
            f"{c} AS (SELECT p.cid, COALESCE(u.c, p.c) AS c FROM {prev} p LEFT JOIN {u} u ON p.cid = u.cid)"
        )
        prev = c
    parts.append(f"cf AS (SELECT cid, c FROM {prev})")
    parts.append(
        f"af AS (SELECT vec_id, v, acid AS cid FROM ("
        f"SELECT e.vec_id, e.v, c.cid AS acid, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        f"list_sum(list_transform(c.c, y -> y * y)) - 2 * list_sum(list_transform(range(1, {dim + 1}), i -> c.c[i] * e.v[i])), c.cid) AS rn "
        f"FROM e CROSS JOIN cf c) WHERE rn = 1)"
    )
    return "WITH " + ", ".join(parts)


def q_sim_ivf(nprobe=4, topk=10, nq=5, dim=DIM):
    return (
        lloyd_ctes()
        + f""",
n AS (SELECT vec_id, v, cid, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM af),
probes AS (SELECT q_id, q_v, q_nrm, cid FROM (
  SELECT q.vec_id AS q_id, q.v AS q_v, q.nrm AS q_nrm, c.cid,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
           list_sum(list_transform(c.c, y -> y * y)) - 2 * list_sum(list_transform(range(1, {dim + 1}), i -> c.c[i] * q.v[i])), c.cid) AS pr
  FROM n q CROSS JOIN cf c WHERE q.vec_id < {nq}) WHERE pr <= {nprobe}),
pairs AS (SELECT p.q_id, c.vec_id AS cand_id,
    round(list_sum(list_transform(range(1, {dim + 1}), i -> p.q_v[i] * c.v[i])) / (p.q_nrm * c.nrm), 4) AS cos_sim
  FROM probes p JOIN n c ON p.cid = c.cid AND p.q_id <> c.vec_id),
r AS (SELECT q_id, cand_id, cos_sim, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id) AS rn FROM pairs)
SELECT q_id, CAST(rn AS INTEGER) AS rn, cand_id, cos_sim FROM r WHERE rn <= {topk} ORDER BY q_id, rn"""
    )


def q_ivf_balance(k=K):
    return (
        lloyd_ctes()
        + f""",
cells AS (SELECT cid AS centroid_id, count(*) AS n_vecs FROM af GROUP BY cid),
tot AS (SELECT CAST(sum(n_vecs) AS DOUBLE) AS n_total, CAST(max(n_vecs) AS DOUBLE) AS n_max, CAST(count(*) AS DOUBLE) AS n_cells FROM cells)
SELECT centroid_id, n_vecs,
  CAST(round(CAST(n_vecs / n_total AS DECIMAL(20,8)), 4) AS DOUBLE) AS share,
  CAST(round(CAST(n_max / (n_total / n_cells) AS DECIMAL(20,8)), 4) AS DOUBLE) AS imbalance_factor,
  CAST({k} - CAST(n_cells AS BIGINT) AS BIGINT) AS n_empty_cells
FROM cells CROSS JOIN tot ORDER BY centroid_id"""
    )


def q_cluster_purity():
    return (
        lloyd_ctes()
        + """,
lab AS (SELECT a.cid AS centroid_id, e.label FROM af a JOIN e ON a.vec_id = e.vec_id),
cl AS (SELECT centroid_id, label, count(*) AS cnt FROM lab GROUP BY centroid_id, label),
tc AS (SELECT centroid_id, label, cnt,
       row_number() OVER (PARTITION BY centroid_id ORDER BY cnt DESC, label) AS rk FROM cl),
nv AS (SELECT centroid_id, sum(cnt) AS n_vecs FROM cl GROUP BY centroid_id),
pc AS (SELECT nv.centroid_id, nv.n_vecs, tc.label AS top_label, tc.cnt AS n_top
       FROM nv JOIN tc ON nv.centroid_id = tc.centroid_id AND tc.rk = 1),
pc2 AS (SELECT centroid_id, CAST(n_vecs AS BIGINT) AS n_vecs, top_label, CAST(n_top AS BIGINT) AS n_top,
        CAST(round(CAST(CAST(n_top AS DOUBLE) / n_vecs AS DECIMAL(20,8)), 4) AS DOUBLE) AS purity FROM pc),
allr AS (SELECT CAST(-1 AS INTEGER) AS centroid_id, CAST(sum(n_vecs) AS BIGINT) AS n_vecs,
         CAST(-1 AS INTEGER) AS top_label, CAST(sum(n_top) AS BIGINT) AS n_top,
         CAST(round(CAST(CAST(sum(n_top) AS DOUBLE) / sum(n_vecs) AS DECIMAL(20,8)), 4) AS DOUBLE) AS purity FROM pc2)
SELECT * FROM pc2 UNION ALL SELECT * FROM allr ORDER BY centroid_id"""
    )


def q_semdedup(threshold=0.25):
    return (
        lloyd_ctes()
        + f""",
n AS (SELECT vec_id, v, cid, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM af),
dups AS (SELECT b.vec_id, count(*) AS n_earlier_dups FROM n a JOIN n b
  ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_sum(list_transform(range(1, {DIM + 1}), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) >= {threshold}
  GROUP BY b.vec_id)
SELECT e.vec_id, d.vec_id IS NULL AS keep, COALESCE(d.n_earlier_dups, 0) AS n_earlier_dups
FROM e LEFT JOIN dups d ON e.vec_id = d.vec_id ORDER BY e.vec_id"""
    )


def compare(con, name, sql, out_dir):
    spark = pd.read_parquet(f"{out_dir}/{name}")
    duck = con.execute(sql).df()
    spark = spark[sorted(spark.columns)].reset_index(drop=True)
    duck = duck[sorted(duck.columns)].reset_index(drop=True)
    if spark.shape != duck.shape:
        print(f"FAIL {name}: shape {spark.shape} vs {duck.shape}")
        return False
    try:
        pd.testing.assert_frame_equal(spark, duck, check_dtype=True)
        print(f"OK   {name} ({len(spark)} rows)")
        return True
    except AssertionError as ex:
        print(f"FAIL {name}: {str(ex)[:2000]}")
        return False


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    ok = True
    ok &= compare(con, "q_sim_ivf", q_sim_ivf(), out_dir)
    ok &= compare(con, "q_ivf_balance", q_ivf_balance(), out_dir)
    ok &= compare(con, "q_cluster_purity", q_cluster_purity(), out_dir)
    ok &= compare(con, "q_semdedup", q_semdedup(), out_dir)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
