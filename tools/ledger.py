#!/usr/bin/env python3
"""Infeasible-oracle ledger stand-in: for a Spark query output that the
DuckDB oracle cannot re-derive on this box at sf10 (the shingle-explode /
150M-row class), pin the output with an ORDER-FREE checksum so future
rounds can detect any drift without re-running the oracle:

  count(*)  +  sum(hash(col1, col2, ...))  over every row, one scan, no sort.

The multi-arg hash is NULL- and type-aware per POSITION (ADVICE_r15:
the old concat_ws('|', ...) form silently skipped NULL arguments and a
'|' inside a value could realign with the delimiter, so e.g.
('a', NULL, 'b') and ('a', 'b', NULL) pinned identically). The legacy
checksum is still emitted as `checksum_legacy` so pins recorded before
round 16 stay comparable during the transition; new pins record
`checksum` (the v2 field). Each line carries an explicit `"v": 2`
version marker (ADVICE_r16): a comparer must match same-version fields
— `checksum` against a v2-era pin, `checksum_legacy` against a
pre-round-16 pin's `checksum` — and a naive all-fields diff against an
unversioned old line means the generations are mixed, not that the
data drifted. All 11 round-15 pins were re-recorded with both values
in CORRECTNESS_SF1.md §round-16, so both directions stay checkable.

The checksum is not cross-engine validation (the sf3 full-hash PASS is
the cross-engine evidence for these queries); it is a regression pin at
the scale the oracle cannot reach.

Usage: python3 tools/ledger.py <verifyOutDir> <name> [<name> ...]
Prints one JSON line per query:
  {"name", "rows", "checksum", "checksum_legacy", "cols"}.
"""
import sys, glob, json
import duckdb

def main(out_dir, names):
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = false")
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(json.dumps({"name": name, "error": "no spark output"}))
            continue
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()]
        row_v2 = "hash(" + ", ".join(f'"{c}"' for c in cols) + ")"
        row_v1 = "hash(concat_ws('|', " + ", ".join(
            f'CAST("{c}" AS VARCHAR)' for c in cols) + "))"
        n, h2, h1 = con.sql(
            f"SELECT count(*), sum({row_v2}), sum({row_v1}) "
            f"FROM '{out_dir}/{name}/*.parquet'").fetchone()
        print(json.dumps({"name": name, "v": 2, "rows": int(n),
                          "checksum": str(h2), "checksum_legacy": str(h1),
                          "cols": cols}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
