#!/bin/bash
# Chase graft.Verify at sf10: as each query's _SUCCESS lands, run DuckDB
# parity on it (one at a time, bounded threads/memory). Monster oracles
# (shingle-explode class) are deferred to a manual second wave.
set -u
OUT=${CHASE_OUT:-/tmp/verify_sf10_full}
SF=${CHASE_SF:-/tmp/sf10}
# claim state lives UNDER $OUT (ADVICE_r15): two chases pointed at
# different output dirs must not share a done-file/lock
DONEFILE="$OUT/.parity_done"
LOG=/tmp/parity_sf10_chase.log
# monster-oracle defer list: one shared source of truth (ADVICE_r15)
DEFER=${CHASE_DEFER:-$(cat "$(dirname "$0")/parity_defer.txt")}
mkdir -p "$OUT"   # ADVICE_r16: a chase started before graft.Verify creates $OUT must not lose its done-file
touch "$DONEFILE"
LOCK="$OUT/.parity_done.lock"
claim() { flock "$LOCK" bash -c "grep -qx '$1' '$DONEFILE' && exit 1; echo '$1' >> '$DONEFILE'"; }
# seed with the 29 r14 spot passes? no — re-verify everything in this dir.
end_by=$(( $(date +%s) + 4*3600 ))
while [ "$(date +%s)" -lt "$end_by" ]; do
  progress=0
  for d in "$OUT"/*/; do
    n=$(basename "$d")
    [ -f "$d/_SUCCESS" ] || continue
    grep -qx "$n" "$DONEFILE" && continue
    case " $DEFER " in (*" $n "*) claim "$n" && echo "DEFERRED $n" >> "$LOG"; continue;; esac
    claim "$n" || continue
    echo "=== $n $(date +%H:%M:%S)" >> "$LOG"
    PARITY_ONLY="$n" PARITY_THREADS=8 PARITY_NO_ORDER=1 \
      PARITY_MEMORY_LIMIT=40GB PARITY_TEMP_DIR=/tmp/duck_spill_r15 \
      timeout 2400 python3 /root/repo/tools/parity.py "$SF" "$OUT" >> "$LOG" 2>&1
    rc=$?
    [ $rc -ne 0 ] && echo "PARITY-RC $n: $rc" >> "$LOG"
    progress=1
  done
  # exit when verify has finished (no java) and everything processed
  if [ "$progress" = 0 ]; then
    if ! pgrep -f "graft.Verify" > /dev/null; then
      total=$(ls -d "$OUT"/*/ | wc -l)
      donect=$(sort -u "$DONEFILE" | wc -l)
      [ "$donect" -ge "$total" ] && break
    fi
    sleep 30
  fi
done
echo "CHASE-DONE $(date +%H:%M:%S)" >> "$LOG"
