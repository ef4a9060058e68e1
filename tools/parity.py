#!/usr/bin/env python3
"""Local oracle-parity harness: mirrors the driver's DuckDB compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata parquet as a
view named after the table, runs every oracle SQL in DuckDB, and compares
against the Spark result parquet at <verifyOutDir>/<name>/ — columns sorted
by name, rows sorted by all columns, exact value equality.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))
            else:
                rr.append((str(type(v).__name__), str(v)))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # PARITY_THREADS bounds DuckDB's parallelism (default: all cores) so a
    # long sf1 oracle pass can share the box with Spark runs; PARITY_ONLY
    # (comma-sep names) restricts to a subset, PARITY_SKIP skips names —
    # both let a resumed pass avoid redoing queries already recorded.
    import os
    if os.environ.get("PARITY_THREADS"):
        con.execute(f"SET threads = {int(os.environ['PARITY_THREADS'])}")
    # Heavy sf3+ oracles (minhash/simhash shingle explodes, LSH self-joins)
    # can exceed DuckDB's default 80%-of-RAM cap on a contended box; a hard
    # limit + an explicit spill dir makes them spill instead of dying with
    # "Out of Memory Error" / filling the cwd-relative .tmp.
    if os.environ.get("PARITY_MEMORY_LIMIT"):
        con.execute(f"SET memory_limit = '{os.environ['PARITY_MEMORY_LIMIT']}'")
    if os.environ.get("PARITY_TEMP_DIR"):
        os.makedirs(os.environ["PARITY_TEMP_DIR"], exist_ok=True)
        con.execute(f"SET temp_directory = '{os.environ['PARITY_TEMP_DIR']}'")
    # Row order is irrelevant here (norm() sorts before comparing), and
    # preserving insertion order forces DuckDB to buffer far more of a
    # large pipeline — another documented memory lever for heavy oracles.
    if os.environ.get("PARITY_NO_ORDER"):
        con.execute("SET preserve_insertion_order = false")
    only = set(filter(None, os.environ.get("PARITY_ONLY", "").split(",")))
    skip = set(filter(None, os.environ.get("PARITY_SKIP", "").split(",")))
    for t in TABLES:
        # partial sf dirs (e.g. /tmp/sf1 carries only documents+embeddings)
        # register what exists; queries over absent tables just error out
        import os
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    omitted = []
    for name, sql in sorted(oracles.items()):
        if (only and name not in only) or name in skip:
            omitted.append(name)
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}")
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERROR {name}: {e}")
            n_fail += 1
            continue
        spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        ocols, scols = sorted(oracle.columns), sorted(spark.columns)
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        o = norm(oracle[ocols].itertuples(index=False, name=None))
        s = norm(spark[scols].itertuples(index=False, name=None))
        if o == s:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: oracle {len(o)} rows vs spark {len(s)} rows")
            for i, (a, b) in enumerate(zip(o, s)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n   oracle={a}\n   spark ={b}")
                    break
            else:
                extra = o[len(s):] if len(o) > len(s) else s[len(o):]
                print(f"  extra rows on {'oracle' if len(o)>len(s) else 'spark'} side: {extra[:3]}")
            n_fail += 1
    # A subset run must never read like a full parity pass: name what was
    # omitted and tag the summary so a resumed run's log can't be mistaken
    # for complete verification.
    if omitted:
        print(f"\nOMITTED ({len(omitted)} queries, via PARITY_ONLY/PARITY_SKIP):")
        for name in omitted:
            print(f"  SKIPPED {name}")
        print(f"\n{n_pass} pass, {n_fail} fail (SUBSET: {len(omitted)} queries skipped)")
    else:
        print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
