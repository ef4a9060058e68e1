#!/bin/bash
# Round-19 measurement probes:
#   1. VERDICT_r18 #4 — the k2Divisor=2 certification ladder, run the
#      same way div=1 was certified: capped-vs-uncapped detection +
#      planted recall at 600k, then at 2M (SPARK_GRAFT_HIER_K2DIV=2
#      threads the divisor through BOTH sides of the semdedup_hier leg).
#   2. VERDICT_r18 #2 — the 20M planted-coverage reading the retrofitted
#      side table makes cheap. Uncapped ground truth is infeasible at
#      20M (the capped run alone is 4.78B pair rows / 86 min; uncapped
#      turns every over-cap block from m-1 star rows into m(m-1)/2),
#      so this is the planted-only leg via hier_div at divisor 1 —
#      absolute coverage of the 999,358-pair planted class.
#      SPARK_GRAFT_HIER_BUDGET=500000000 halves the per-pass transient
#      (r18 crest 86.8 GiB used vs this box's ~94 GiB usable ceiling).
# Run each leg in its own JVM, sequentially, on a quiet box.
# Usage: tools/probes_r19.sh [resultsFile]
set -uo pipefail
RES=${1:-/tmp/probes_r19_results.txt}
cd "$(dirname "$0")/.."

echo "=== 600k hier div=2: capped-vs-uncapped + planted ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv600k SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_HIER_K2DIV=2 \
  tools/run.sh graft.RecallProbe semdedup_hier 2>/dev/null | tee -a "$RES"

echo "=== 2M hier div=2: capped-vs-uncapped + planted ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv2m SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_HIER_K2DIV=2 \
  tools/run.sh graft.RecallProbe semdedup_hier 2>/dev/null | tee -a "$RES"

echo "=== 20M hier div=1 planted-only coverage reading ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv20m SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_HIER_DIVISORS=1 SPARK_GRAFT_HIER_BUDGET=500000000 \
  tools/run.sh graft.RecallProbe hier_div 2>/dev/null | tee -a "$RES"
echo "=== done ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
