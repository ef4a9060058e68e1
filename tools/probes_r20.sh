#!/bin/bash
# Round-20 measurement probe (VERDICT_r19 #1, the "done" criterion's
# second half): complete >24M on a single box via the assignment-phase
# coarse-cell sharding. 30M x 64-dim on the regenerated /tmp/sfv30m
# fixture, 4 shards (per-shard working set ~= 30/4 = 7.5M x 2.81 GiB/M
# ~= 21 GiB vs the ~57 GiB headroom next to the 7.5 GiB fixture; the
# unsharded form needs ~84 GiB and died at both 30M and 24M), pair
# budget 5e8 as in the r18/r19 20M runs, planted coverage from the
# generator's side table (the fourth decade of the recall series:
# 600k -> 2M -> 20M -> 30M). A 60 s df sampler records the disk crest.
# Usage: tools/probes_r20.sh [resultsFile]
set -uo pipefail
RES=${1:-/tmp/probes_r20_results.txt}
cd "$(dirname "$0")/.."

( while true; do
    echo "disk $(date -u +%H:%M:%S) $(df --output=used,avail -BG / | tail -1)" >> /tmp/probe30m_disk.log
    sleep 60
  done ) &
SAMPLER=$!
trap "kill $SAMPLER 2>/dev/null" EXIT

echo "=== 30M hier SHARDED x4 div=1: completion + planted coverage ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
SPARK_GRAFT_SF_DIR=/tmp/sfv30m SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_HIER_DIVISORS=1 SPARK_GRAFT_HIER_BUDGET=500000000 \
  SPARK_GRAFT_HIER_SHARDS=4 \
  tools/run.sh graft.RecallProbe hier_div 2>/tmp/probe30m_stderr.log | tee -a "$RES"
echo "=== done rc=$? ($(date -u +%H:%M:%S)) ===" | tee -a "$RES"
