#!/bin/bash
# Round-18 sf10 ledger conversion driver (VERDICT_r17 #4): Spark outputs
# for the nine remaining ledger rows, then the chunked/staged DuckDB
# re-derivation for each, sequentially (one heavy job at a time — the
# single-query oracles died on WHOLE-BOX spills; the chunked forms are
# bounded but still deserve the disk to themselves).
#
# The four minhash-family queries share one db via CHUNK_REUSE=1 so the
# ~12-min sf10 signature stage and the band tables compute once.
# Queries run verdict-priority-first (the named triangle/CC rows), so a
# wall-clock cut still converts the most-wanted rows.
# Usage: tools/ledger_r18.sh <sf10Dir> <outDir> [resultsFile]
set -uo pipefail
SF=${1:-/tmp/sf10}
OUT=${2:-/tmp/verify_sf10_r18}
RES=${3:-/tmp/ledger_r18_results.txt}
cd "$(dirname "$0")/.."

QUERIES="minhash_sig minhash_lsh_pairs minhash_est doc_dup_clusters \
doc_dup_triangles emb_neardup emb_neardup_auto simhash_pairs \
graph_pagerank_general doc_winnow"

echo "=== Spark outputs at sf10 ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
  tools/run.sh graft.Verify "$SF" "$OUT" $QUERIES 2>&1 | grep -E "\[verify\]" | tee -a "$RES"
echo "=== spark done ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"

run_q() {
  local q=$1; shift
  echo "=== chunked ledger: $q ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
  CHUNK_THREADS=${CHUNK_THREADS:-16} CHUNK_MEMORY_LIMIT=${CHUNK_MEMORY_LIMIT:-40GB} \
    "$@" timeout 7200 python3 tools/chunked_ledger.py "$SF" "$OUT" "$q" /tmp/cl_sf10 \
    2>&1 | tail -3 | tee -a "$RES"
}

# minhash family: shared db, sig/bands computed once
for q in doc_dup_clusters doc_dup_triangles minhash_lsh_pairs minhash_est; do
  run_q "$q" env CHUNK_REUSE=1
done
rm -rf /tmp/cl_sf10/shared.db /tmp/cl_sf10/spill

for q in doc_winnow graph_pagerank_general emb_neardup emb_neardup_auto \
         simhash_pairs; do
  run_q "$q" env
  rm -rf /tmp/cl_sf10/"$q".db /tmp/cl_sf10/spill
done
echo "=== done ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
