#!/usr/bin/env python3
"""Chunked DuckDB re-derivation for the two sf10 ledger rows whose
single-query oracles measurably do not fit this box (VERDICT_r16 #8 /
CORRECTNESS_SF1.md round-15: `emb_semantic_dedup_auto` spilled >55 GB,
`emb_semantic_dedup_hier` >71 GB, both killed). The single-query forms die
on the k-means assignment join (qn x all-centroids before the hash
aggregate) and the all-clusters pair fan-out; this tool runs the SAME
integer-exact pipeline (mirroring MlQueries' kmeansChain/semDedupTail/
hierFineCtes CTE-for-CTE) but materializes each stage and bounds every
intermediate:

  - assignment argmin is chunked over CENTROID ranges (per chunk: a
    qn-x-chunk hash aggregate and a per-vector argmin, then a final
    argmin across the per-chunk winners — tie-break ORDER BY dist, cid
    preserved at both levels, since the global minimum's (dist, cid) is
    the minimum of the per-chunk minima);
  - within-cluster pair scoring is chunked over clusters PACKED by pair
    volume (sum n_c^2 per chunk bounded), the star branch in one pass;
  - the hier fine level loops cells (each cell's k2-means is tiny).

The result is compared against the Spark output parquet exactly the way
tools/parity.py does it in spirit: identical row SETS (count equality +
symmetric EXCEPT) on explicitly-cast BIGINT columns.

Usage:
  python3 tools/chunked_oracle.py <sfDir> <verifyOutDir> <query> [workDir]
    query in {emb_semantic_dedup_auto, emb_semantic_dedup_hier,
              emb_semantic_dedup_auto2, emb_semantic_dedup_auto2_capped,
              emb_semantic_dedup_ladder (n < 400k rung)}

Env: CHUNK_THREADS, CHUNK_MEMORY_LIMIT (e.g. 40GB), CHUNK_CENTROIDS
(centroid chunk width, default 64), CHUNK_PAIR_BUDGET (pairs per pair
chunk, default 4,000,000).
"""
import math
import os
import sys
import time

import duckdb

QUANT_SCALE = 1 << 20
CAP = 1024  # Similarity.DefaultMaxCluster


def log(msg):
    print(f"[chunked-oracle +{time.time()-T0:.0f}s] {msg}", flush=True)


def auto_k(n):
    # Similarity.autoKmeansK: ceil(sqrt((n+1) div 2)) — integer-exact
    m = (n + 1) // 2
    s = math.isqrt(m)
    return max(1, s if s * s == m else s + 1)


def auto_k2(n, cap=CAP, headroom=4):
    # Similarity.autoKmeansKCapAware: GREATEST(√-rule, ceil(headroom·n/cap))
    t = headroom * n
    return max(auto_k(n), t // cap + (0 if t % cap == 0 else 1))


def auto_coarse_k(n):
    # Similarity.autoCoarseK: smallest k with k^3 >= n (integer probes)
    k = max(1, round(n ** (1.0 / 3.0)) - 2)
    while k ** 3 < n:
        k += 1
    return k


def setup(con, sf_dir):
    if os.environ.get("CHUNK_THREADS"):
        con.execute(f"SET threads = {int(os.environ['CHUNK_THREADS'])}")
    if os.environ.get("CHUNK_MEMORY_LIMIT"):
        con.execute(
            f"SET memory_limit = '{os.environ['CHUNK_MEMORY_LIMIT']}'")
    con.execute("SET preserve_insertion_order = false")
    con.execute(f"CREATE OR REPLACE VIEW embeddings AS "
                f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    log("materializing qn (vec_id, d, qv)")
    con.execute(f"""
      CREATE OR REPLACE TABLE qn AS
      WITH quant AS (
        SELECT vec_id, list_transform(embedding,
          v -> CAST(floor(CAST(v AS DOUBLE) * {QUANT_SCALE}) AS BIGINT)) AS q
        FROM embeddings)
      SELECT vec_id, d, q[d+1] AS qv
      FROM quant, generate_series(0, 63) t(d)
      WHERE d < len(q)""")


def chunked_argmin(con, cents, cent_id, cent_dim, cent_val, out_table,
                   scope_join=""):
    """a = argmin_{c in cents} SUM_d (qn.qv - c.val)^2, ties to lowest id.

    cents(cent_id, cent_dim, cent_val); optional scope_join restricts
    which (vector, centroid) pairs compete (the hier fine level scopes
    by coarse cell). Writes out_table(vec_id [, cluster], cid).
    """
    width = int(os.environ.get("CHUNK_CENTROIDS", "64"))
    cids = [r[0] for r in con.execute(
        f"SELECT DISTINCT {cent_id} FROM {cents} ORDER BY 1").fetchall()]
    con.execute("CREATE OR REPLACE TABLE best_parts "
                "(vec_id BIGINT, cid BIGINT, dist BIGINT)")
    for i in range(0, len(cids), width):
        lo, hi = cids[i], cids[min(i + width, len(cids)) - 1]
        con.execute(f"""
          INSERT INTO best_parts
          SELECT vec_id, cid, dist FROM (
            SELECT v.vec_id, c.{cent_id} AS cid,
                   SUM((v.qv - c.{cent_val}) * (v.qv - c.{cent_val})) AS dist,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY SUM((v.qv - c.{cent_val})
                                               * (v.qv - c.{cent_val})),
                                               c.{cent_id}) AS rn
            FROM qn v
            JOIN {cents} c ON c.{cent_dim} = v.d
                 AND c.{cent_id} BETWEEN {lo} AND {hi} {scope_join}
            GROUP BY v.vec_id, c.{cent_id}) WHERE rn = 1""")
        log(f"  argmin chunk {i//width + 1}/{(len(cids)+width-1)//width}")
    con.execute(f"""
      CREATE OR REPLACE TABLE {out_table} AS
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM best_parts) WHERE rn = 1""")
    con.execute("DROP TABLE best_parts")


def kmeans_chain(con, k, out_table):
    """kmeansChain mirrored: seeds = vec_id < k, one floor-average Lloyd
    update, final assignment -> out_table(vec_id, cluster)."""
    log(f"k-means chain k={k}: init seeds")
    con.execute(f"""CREATE OR REPLACE TABLE c0n AS
      SELECT vec_id AS cid, d, qv AS cv FROM qn WHERE vec_id < {k}""")
    log("a0 (chunked argmin over seed centroids)")
    chunked_argmin(con, "c0n", "cid", "d", "cv", "a0")
    log("c1 (floor-average update)")
    con.execute("""
      CREATE OR REPLACE TABLE c1 AS
      SELECT a0.cid, v.d AS dim,
             CAST(floor(CAST(SUM(v.qv) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cd
      FROM qn v JOIN a0 ON a0.vec_id = v.vec_id
      GROUP BY 1, 2""")
    log("a1 (chunked argmin over updated centroids)")
    chunked_argmin(con, "c1", "cid", "dim", "cd", "a1_t")
    con.execute(f"CREATE OR REPLACE TABLE {out_table} AS "
                f"SELECT vec_id, cid AS cluster FROM a1_t")
    con.execute("DROP TABLE a0"); con.execute("DROP TABLE a1_t")
    con.execute("DROP TABLE c0n"); con.execute("DROP TABLE c1")


def pair_dedup(con, assign, group_cols, out_dropped, threshold=0.4,
               cap=CAP):
    """semDedupTail / hier tail mirrored over assign(vec_id, <group_cols>):
    groups at or under CAP enumerate all within-group pairs, oversized
    groups star-link member-vs-group-min-rep; pairs scoring
    list_cosine_similarity >= threshold drop id_b. Pair enumeration is
    chunked by groups packed to CHUNK_PAIR_BUDGET pairs."""
    budget = int(os.environ.get("CHUNK_PAIR_BUDGET", "4000000"))
    gc = ", ".join(group_cols)
    on_eq = " AND ".join(f"s.{c} = a.{c}" for c in group_cols)
    on_eq_b = " AND ".join(f"a.{c} = b.{c}" for c in group_cols)
    con.execute(f"""
      CREATE OR REPLACE TABLE gsizes AS
      SELECT {gc}, COUNT(*) AS n, MIN(vec_id) AS rep
      FROM {assign} GROUP BY {gc}""")
    con.execute(f"CREATE OR REPLACE TABLE {out_dropped} (vec_id BIGINT)")
    # star branch: one pass (row count = sum of over-cap group sizes <= N)
    con.execute(f"""
      INSERT INTO {out_dropped}
      SELECT DISTINCT m.vec_id
      FROM {assign} m
      JOIN gsizes s ON {" AND ".join(f"s.{c} = m.{c}" for c in group_cols)}
                   AND s.n > {cap}
      JOIN embeddings ea ON ea.vec_id = s.rep
      JOIN embeddings eb ON eb.vec_id = m.vec_id
      WHERE m.vec_id <> s.rep
        AND list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                   CAST(eb.embedding AS DOUBLE[]))
            >= {threshold}""")
    # small-group pair branch: pack groups into chunks of ~budget pairs
    groups = con.execute(
        f"SELECT {gc}, n FROM gsizes WHERE n <= {cap} ORDER BY {gc}"
    ).fetchall()
    chunks, cur, vol = [], [], 0
    for row in groups:
        g, n = row[:-1], row[-1]
        pairs = n * (n - 1) // 2
        if cur and vol + pairs > budget:
            chunks.append(cur); cur, vol = [], 0
        cur.append(g); vol += pairs
    if cur:
        chunks.append(cur)
    for idx, chunk in enumerate(chunks):
        vals = ", ".join("(" + ", ".join(str(x) for x in g) + ")"
                         for g in chunk)
        gcols_t = ", ".join(f"g{i}" for i in range(len(group_cols)))
        on_scope = " AND ".join(
            f"a.{c} = t.g{i}" for i, c in enumerate(group_cols))
        con.execute(f"""
          INSERT INTO {out_dropped}
          SELECT DISTINCT b.vec_id
          FROM (VALUES {vals}) t({gcols_t})
          JOIN {assign} a ON {on_scope}
          JOIN {assign} b ON {on_eq_b} AND a.vec_id < b.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings eb ON eb.vec_id = b.vec_id
          WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[]))
                >= {threshold}""")
        log(f"  pair chunk {idx+1}/{len(chunks)} "
            f"({len(chunk)} groups)")
    con.execute(f"""
      CREATE OR REPLACE TABLE out AS
      SELECT e.vec_id,
             CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_dup
      FROM embeddings e
      LEFT JOIN (SELECT DISTINCT vec_id FROM {out_dropped}) d
      USING (vec_id)""")


def hier_fine(con):
    """hierFineCtes mirrored, looping coarse cells: per-cell k2-means
    (seeds = k2 lowest vec_ids, one floor-average update, argmin ties to
    lowest seed) -> fa1(vec_id, cluster, sub)."""
    cells = con.execute(
        "SELECT cluster, COUNT(*) AS m FROM coarse GROUP BY 1 ORDER BY 1"
    ).fetchall()
    con.execute("CREATE OR REPLACE TABLE fa1 "
                "(vec_id BIGINT, cluster BIGINT, sub BIGINT)")
    for ci, (cell, m) in enumerate(cells):
        k2 = auto_k(m)
        con.execute(f"""
          INSERT INTO fa1
          WITH cv AS (
            SELECT q.vec_id, q.d, q.qv
            FROM qn q JOIN coarse a ON a.vec_id = q.vec_id
            WHERE a.cluster = {cell}),
          seeds AS (
            SELECT r.vec_id AS cid FROM (
              SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
              FROM coarse WHERE cluster = {cell}) r
            WHERE r.rn <= {k2}),
          seedn AS (
            SELECT s.cid, q.d, q.qv AS cv
            FROM seeds s JOIN cv q ON q.vec_id = s.cid),
          fd0 AS (
            SELECT v.vec_id, s.cid,
                   SUM((v.qv - s.cv) * (v.qv - s.cv)) AS dist
            FROM cv v JOIN seedn s ON s.d = v.d
            GROUP BY 1, 2),
          fa0 AS (
            SELECT vec_id, cid FROM (
              SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY dist, cid) AS rn
              FROM fd0) WHERE rn = 1),
          fc1 AS (
            SELECT f.cid, v.d AS dim,
                   CAST(floor(CAST(SUM(v.qv) AS DOUBLE) / COUNT(*))
                     AS BIGINT) AS cd
            FROM cv v JOIN fa0 f ON f.vec_id = v.vec_id
            GROUP BY 1, 2),
          fd1 AS (
            SELECT v.vec_id, c.cid,
                   SUM((v.qv - c.cd) * (v.qv - c.cd)) AS dist
            FROM cv v JOIN fc1 c ON c.dim = v.d
            GROUP BY 1, 2)
          SELECT vec_id, {cell} AS cluster, cid AS sub FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM fd1) WHERE rn = 1""")
        if (ci + 1) % 10 == 0 or ci + 1 == len(cells):
            log(f"  fine level: cell {ci+1}/{len(cells)}")


def compare(con, out_dir, name):
    spark = f"'{out_dir}/{name}/*.parquet'"
    n_oracle, n_spark, n_diff = con.execute(f"""
      SELECT
        (SELECT COUNT(*) FROM out),
        (SELECT COUNT(*) FROM {spark}),
        (SELECT COUNT(*) FROM (
           (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(is_dup AS BIGINT) AS is_dup FROM out
            EXCEPT
            SELECT CAST(vec_id AS BIGINT), CAST(is_dup AS BIGINT)
            FROM {spark})
           UNION ALL
           (SELECT CAST(vec_id AS BIGINT), CAST(is_dup AS BIGINT)
            FROM {spark}
            EXCEPT
            SELECT CAST(vec_id AS BIGINT), CAST(is_dup AS BIGINT)
            FROM out)))""").fetchone()
    ok = n_oracle == n_spark and n_diff == 0
    dups = con.execute("SELECT SUM(is_dup) FROM out").fetchone()[0]
    print(f"{'PASS' if ok else 'FAIL'} {name}: oracle rows={n_oracle} "
          f"spark rows={n_spark} symmetric-diff={n_diff} "
          f"(oracle is_dup sum={dups})", flush=True)
    return ok


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    work = sys.argv[4] if len(sys.argv) > 4 else "/tmp/chunked_oracle"
    os.makedirs(work, exist_ok=True)
    con = duckdb.connect(f"{work}/{name}.db")
    con.execute(f"SET temp_directory = '{work}/spill'")
    setup(con, sf_dir)
    n = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    if name == "emb_semantic_dedup_auto":
        k = auto_k(n)
        log(f"n={n}, auto k={k}")
        kmeans_chain(con, k, "a1")
        log("pair scoring (chunked by cluster pair volume)")
        pair_dedup(con, "a1", ["cluster"], "dropped")
    elif name in ("emb_semantic_dedup_auto2", "emb_semantic_dedup_ladder"):
        # auto2: cap-aware k = GREATEST(√-rule, ceil(4n/1024)); the
        # ladder query at n < 400,000 (its measured crossover) takes the
        # single-level rung with the IDENTICAL k and cap — same chain
        if name == "emb_semantic_dedup_ladder":
            assert n < 400000, (
                "ladder at n >= crossover takes the hier rung; use the "
                "emb_semantic_dedup_hier recipe for that regime")
        k = auto_k2(n)
        log(f"n={n}, cap-aware k={k}")
        kmeans_chain(con, k, "a1")
        log("pair scoring (chunked by cluster pair volume)")
        pair_dedup(con, "a1", ["cluster"], "dropped")
    elif name == "emb_semantic_dedup_auto2_capped":
        # the tiny-cap anchor: cap=64 in BOTH the sizing rule and the
        # block guard (MlQueries pins them together)
        k = auto_k2(n, cap=64)
        log(f"n={n}, cap=64 cap-aware k={k}")
        kmeans_chain(con, k, "a1")
        log("pair scoring (chunked by cluster pair volume, cap=64)")
        pair_dedup(con, "a1", ["cluster"], "dropped", cap=64)
    elif name == "emb_semantic_dedup_hier":
        k1 = auto_coarse_k(n)
        log(f"n={n}, coarse k1={k1}")
        kmeans_chain(con, k1, "coarse")
        log("per-cell fine k2-means")
        hier_fine(con)
        log("pair scoring over (cell, sub) blocks")
        pair_dedup(con, "fa1", ["cluster", "sub"], "dropped")
    else:
        raise SystemExit(f"unsupported query: {name}")
    sys.exit(0 if compare(con, out_dir, name) else 1)


T0 = time.time()
if __name__ == "__main__":
    main()
