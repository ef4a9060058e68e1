#!/usr/bin/env python3
"""Chunked DuckDB re-derivation for the minhash-family sf10 ledger rows
(VERDICT_r17 #4): `minhash_lsh_pairs`, `minhash_est`, `doc_dup_clusters`,
`doc_dup_triangles`. Their single-query oracles die at sf10 on the
128-hash shingle explode compounded with the band self-join / wedge
fan-out / recursive-CTE closure all living in one query (CORRECTNESS_SF1
round-15 ledger). This tool runs the SAME integer-exact pipeline with
every stage materialized and every fan-out bounded, the
tools/chunked_oracle.py pattern:

  - `sig` is executed VERBATIM from the declared minhash_sig oracle SQL
    (read out of the verify dump's oracle_sql.json, so the signature
    arithmetic cannot drift from what the hash gate checks) — the one
    stage known solo-feasible at sf10 (~12 min, round-15 PASS);
  - band tables + the hot-bucket guard mirror MlQueries.bandsSql
    CTE-for-CTE; the band self-join runs one band per pass;
  - `minhash_est`'s 16-component pair×signature join is chunked over
    hash(doc_a) ranges;
  - `doc_dup_clusters` replaces the recursive-CTE transitive closure
    (quadratic rows per component — the measured 40-min CPU timeout)
    with an ITERATIVE min-label propagation to fixpoint, which computes
    the identical per-vertex component minimum (the closure's
    MIN(dst) per src) in O(E) rows per round, driver-looped;
  - `doc_dup_triangles` enumerates wedges in bounded passes over
    hash(middle vertex) ranges, each pass closed against the edge set
    before the next starts (the 364M-wedge class never materializes at
    once).

Result compare = identical row SETS against the Spark output parquet
(count equality + symmetric EXCEPT on BIGINT-cast columns), as in
tools/chunked_oracle.py.

Usage:
  python3 tools/chunked_ledger.py <sfDir> <verifyOutDir> <query> [workDir]
    query in {minhash_lsh_pairs, minhash_est, doc_dup_clusters,
              doc_dup_triangles}
  <verifyOutDir>/oracle_sql.json must contain the minhash_sig entry
  (run `graft.Verify <sfDir> <outDir> minhash_sig <query>` first).

Env: CHUNK_THREADS, CHUNK_MEMORY_LIMIT (e.g. 40GB), CHUNK_PAIR_CHUNKS
(hash ranges for the est join, default 8), CHUNK_WEDGE_CHUNKS (hash
ranges for the triangle middle vertex, default 16).
"""
import json
import os
import sys
import time

import duckdb

BAND_ROWS = 4      # Dedup.BandRows
NUM_HASHES = 16    # Dedup.NumHashes
MAX_BUCKET = 1024  # Dedup.DefaultMaxBucket


def log(msg):
    print(f"[chunked-ledger +{time.time()-T0:.0f}s] {msg}", flush=True)


def setup(con, sf_dir, out_dir):
    if os.environ.get("CHUNK_THREADS"):
        con.execute(f"SET threads = {int(os.environ['CHUNK_THREADS'])}")
    if os.environ.get("CHUNK_MEMORY_LIMIT"):
        con.execute(
            f"SET memory_limit = '{os.environ['CHUNK_MEMORY_LIMIT']}'")
    con.execute("SET preserve_insertion_order = false")
    con.execute(f"CREATE OR REPLACE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    with open(os.environ.get("ORACLE_SQL_JSON",
                             f"{out_dir}/oracle_sql.json")) as f:
        sig_sql = json.load(f)["minhash_sig"]
    log("materializing sig (doc_id, i, sig) via the declared oracle SQL")
    con.execute(f"CREATE OR REPLACE TABLE sig AS {sig_sql}")
    n = con.execute("SELECT COUNT(*) FROM sig").fetchone()[0]
    log(f"sig rows: {n}")


def bands(con):
    """bands0 / bsizes / bands tables + a bpairs table built one band per
    pass — mirrors MlQueries.bandsSql (hot-bucket guard included)."""
    log("bands0 / bsizes / bands")
    con.execute(f"""
      CREATE OR REPLACE TABLE bands0 AS
      SELECT doc_id, i // {BAND_ROWS} AS band,
             string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS band_key
      FROM sig GROUP BY doc_id, i // {BAND_ROWS}""")
    con.execute("""
      CREATE OR REPLACE TABLE bsizes AS
      SELECT band, band_key, COUNT(*) AS n, MIN(doc_id) AS rep
      FROM bands0 GROUP BY band, band_key""")
    con.execute(f"""
      CREATE OR REPLACE TABLE bandsT AS
      SELECT b.doc_id, b.band, b.band_key FROM bands0 b
      JOIN bsizes s ON s.band = b.band AND s.band_key = b.band_key
      WHERE s.n <= {MAX_BUCKET}""")
    n_bands = NUM_HASHES // BAND_ROWS
    con.execute(
        "CREATE OR REPLACE TABLE bpairs (doc_a BIGINT, doc_b BIGINT)")
    for band in range(n_bands):
        log(f"bpairs: band {band + 1}/{n_bands}")
        con.execute(f"""
          INSERT INTO bpairs
          SELECT a.doc_id, b.doc_id
          FROM bandsT a JOIN bandsT b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          WHERE a.band = {band}""")
        con.execute(f"""
          INSERT INTO bpairs
          SELECT s.rep, b.doc_id
          FROM bands0 b
          JOIN bsizes s ON s.band = b.band AND s.band_key = b.band_key
          WHERE s.n > {MAX_BUCKET} AND b.doc_id <> s.rep
            AND b.band = {band}""")
    n = con.execute("SELECT COUNT(*) FROM bpairs").fetchone()[0]
    log(f"bpairs rows (one per linking band): {n}")


def lsh_pairs(con):
    con.execute("""
      CREATE OR REPLACE TABLE out AS
      SELECT doc_a, doc_b, COUNT(*) AS n_shared_bands
      FROM bpairs GROUP BY 1, 2""")


def est(con):
    chunks = int(os.environ.get("CHUNK_PAIR_CHUNKS", "8"))
    con.execute(
        "CREATE OR REPLACE TABLE pairs AS "
        "SELECT DISTINCT doc_a, doc_b FROM bpairs")
    con.execute("""CREATE OR REPLACE TABLE out
      (doc_a BIGINT, doc_b BIGINT, n_equal BIGINT, n_components BIGINT)""")
    for c in range(chunks):
        log(f"est: pair chunk {c + 1}/{chunks}")
        con.execute(f"""
          INSERT INTO out
          SELECT p.doc_a, p.doc_b,
                 CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_equal,
                 COUNT(*) AS n_components
          FROM (SELECT * FROM pairs
                WHERE hash(doc_a) % {chunks} = {c}) p
          JOIN sig sa ON sa.doc_id = p.doc_a
          JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
          GROUP BY 1, 2""")


def clusters(con):
    """Connected components of the candidate-pair graph. The declared
    oracle's recursive CTE materializes the full reachability relation
    (src, dst) — quadratic rows inside dense near-dup families, the
    measured 40-min CPU timeout at sf10 — and then takes MIN(dst) per
    src. Min-label propagation to fixpoint computes the SAME per-vertex
    component minimum with O(E) rows per iteration: lbl converges to
    min(component) because the minimum is reachable from every vertex
    and labels only ever decrease. Iterations are driver-looped, each a
    bounded hash join."""
    con.execute("""
      CREATE OR REPLACE TABLE edges AS
      SELECT doc_a AS a, doc_b AS b FROM (SELECT DISTINCT doc_a, doc_b
                                          FROM bpairs)
      UNION
      SELECT doc_b, doc_a FROM (SELECT DISTINCT doc_a, doc_b FROM bpairs)""")
    con.execute("""
      CREATE OR REPLACE TABLE lbl AS
      SELECT a AS doc_id, a AS lbl FROM edges GROUP BY a""")
    it = 0
    while True:
        it += 1
        con.execute("""
          CREATE OR REPLACE TABLE lbl2 AS
          SELECT l.doc_id,
                 LEAST(l.lbl, COALESCE(MIN(ln.lbl), l.lbl)) AS lbl
          FROM lbl l
          LEFT JOIN edges e ON e.a = l.doc_id
          LEFT JOIN lbl ln ON ln.doc_id = e.b
          GROUP BY l.doc_id, l.lbl""")
        changed = con.execute("""
          SELECT COUNT(*) FROM lbl2 j JOIN lbl o USING (doc_id)
          WHERE j.lbl <> o.lbl""").fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE lbl2 RENAME TO lbl")
        log(f"clusters: label-prop iteration {it}, {changed} changed")
        if changed == 0:
            break
    con.execute("""
      CREATE OR REPLACE TABLE out AS
      SELECT lbl AS keep_doc_id, COUNT(*) AS n_docs
      FROM lbl GROUP BY lbl""")


def triangles(con):
    chunks = int(os.environ.get("CHUNK_WEDGE_CHUNKS", "16"))
    con.execute("""
      CREATE OR REPLACE TABLE ed AS
      SELECT DISTINCT doc_a AS u, doc_b AS v FROM bpairs""")
    con.execute("CREATE OR REPLACE TABLE pv (s BIGINT)")
    for c in range(chunks):
        log(f"triangles: wedge chunk {c + 1}/{chunks} (middle-vertex hash)")
        # wedges a-b-c with b in this chunk, closed against ed before the
        # next chunk's wedges exist — pv gets each triangle's 3 vertices
        con.execute(f"""
          INSERT INTO pv
          WITH tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM (SELECT * FROM ed WHERE hash(v) % {chunks} = {c}) e1
            JOIN ed e2 ON e2.u = e1.v
            JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v)
          SELECT a FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri""")
    con.execute("""
      CREATE OR REPLACE TABLE out AS
      SELECT s AS doc_id, COUNT(*) AS n_triangles FROM pv GROUP BY 1""")


COLS = {
    "minhash_lsh_pairs": ["doc_a", "doc_b", "n_shared_bands"],
    "minhash_est": ["doc_a", "doc_b", "n_equal", "n_components"],
    "doc_dup_clusters": ["keep_doc_id", "n_docs"],
    "doc_dup_triangles": ["doc_id", "n_triangles"],
}


def compare(con, out_dir, name):
    spark = f"'{out_dir}/{name}/*.parquet'"
    cast = ", ".join(f'CAST("{c}" AS BIGINT) AS "{c}"' for c in COLS[name])
    n_oracle, n_spark, n_diff = con.execute(f"""
      SELECT
        (SELECT COUNT(*) FROM out),
        (SELECT COUNT(*) FROM {spark}),
        (SELECT COUNT(*) FROM (
           (SELECT {cast} FROM out EXCEPT SELECT {cast} FROM {spark})
           UNION ALL
           (SELECT {cast} FROM {spark} EXCEPT SELECT {cast} FROM out)))
      """).fetchone()
    ok = n_oracle == n_spark and n_diff == 0
    print(f"{'PASS' if ok else 'FAIL'} {name}: oracle rows={n_oracle} "
          f"spark rows={n_spark} symmetric-diff={n_diff}", flush=True)
    return ok


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    if name not in COLS:
        raise SystemExit(f"unsupported query: {name}")
    work = sys.argv[4] if len(sys.argv) > 4 else "/tmp/chunked_ledger"
    os.makedirs(work, exist_ok=True)
    con = duckdb.connect(f"{work}/{name}.db")
    con.execute(f"SET temp_directory = '{work}/spill'")
    setup(con, sf_dir, out_dir)
    bands(con)
    {"minhash_lsh_pairs": lsh_pairs, "minhash_est": est,
     "doc_dup_clusters": clusters, "doc_dup_triangles": triangles}[name](con)
    sys.exit(0 if compare(con, out_dir, name) else 1)


T0 = time.time()
if __name__ == "__main__":
    main()
