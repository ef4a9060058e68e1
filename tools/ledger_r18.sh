#!/bin/bash
# Round-18 sf10 ledger conversion driver (VERDICT_r17 #4): Spark outputs
# for the nine remaining ledger rows, then the chunked/staged DuckDB
# re-derivation for each, sequentially (one heavy job at a time — the
# single-query oracles died on WHOLE-BOX spills; the chunked forms are
# bounded but still deserve the disk to themselves).
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

for q in minhash_lsh_pairs minhash_est doc_dup_clusters doc_dup_triangles \
         emb_neardup emb_neardup_auto simhash_pairs graph_pagerank_general \
         doc_winnow; do
  echo "=== chunked ledger: $q ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
  CHUNK_THREADS=${CHUNK_THREADS:-16} CHUNK_MEMORY_LIMIT=${CHUNK_MEMORY_LIMIT:-40GB} \
    timeout 7200 python3 tools/chunked_ledger.py "$SF" "$OUT" "$q" /tmp/cl_sf10 \
    2>&1 | tail -4 | tee -a "$RES"
  rm -rf /tmp/cl_sf10/"$q".db /tmp/cl_sf10/spill
done
echo "=== done ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
