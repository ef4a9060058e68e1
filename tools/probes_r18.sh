#!/bin/bash
# Round-18 measurement probes (run AFTER the 20M completion attempt so
# the timed legs see a quiet box):
#   1. VERDICT_r17 #6 — hier planted recall at 2M via the generator's
#      planted_pairs side table (replaces SCALE_r17 §1's -1: the class
#      is now a semi-join, not a 45 GB sketch).
#   2. VERDICT_r17 #5 — the k2Divisor wider-blocks knob priced at 600k:
#      planted coverage + wall at divisors 1/2/4.
#   3. Cross-validation of the two planted-class definitions at 600k
#      (side table vs the r16 LSH-derived 57,724-member class).
# Usage: tools/probes_r18.sh [resultsFile]
set -uo pipefail
RES=${1:-/tmp/probes_r18_results.txt}
cd "$(dirname "$0")/.."

echo "=== 2M hier recall, planted from side table ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv2m SPARK_DRIVER_MEM=32g \
  tools/run.sh graft.RecallProbe semdedup_hier 2>/dev/null | tee -a "$RES"

echo "=== 600k hier_div coverage/wall at divisors 1,2,4 ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv600k SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_HIER_DIVISORS=1,2,4 \
  tools/run.sh graft.RecallProbe hier_div 2>/dev/null | tee -a "$RES"

echo "=== 600k class cross-validation: side table vs LSH sketch ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv600k SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_RECALL_PLANTED_TABLE=0 SPARK_GRAFT_RECALL_PLANTED_BITS=0 \
  SPARK_GRAFT_RECALL_PLANTED_CAPPED=1 \
  tools/run.sh graft.RecallProbe semdedup_hier 2>/dev/null | tee -a "$RES"
echo "=== done ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
