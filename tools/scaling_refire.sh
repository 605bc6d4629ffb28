#!/bin/bash
# Waits for a probe-clean window (two consecutive one-shot tmpfs dd reads
# >= MIN_GBPS), then fires one paired ScalingBench run. Usage:
#   bash tools/scaling_refire.sh <runId> [minGBps] [maxWaitSec] [reps]
RUN_ID=${1:?runId}
MIN=${2:-2.0}
MAXWAIT=${3:-1800}
REPS=${4:-2}
t0=$(date +%s)
ok=0
while true; do
  r=$(dd if=/dev/zero of=/dev/shm/ddprobe_rf bs=1M count=2048 conv=fdatasync 2>&1 | tail -1 | grep -oE '[0-9.]+ GB/s' | grep -oE '[0-9.]+')
  rm -f /dev/shm/ddprobe_rf
  r=${r:-0}
  echo "$(date +%H:%M:%S) probe ${r} GB/s (need >= $MIN x2)"
  if awk -v r="$r" -v m="$MIN" 'BEGIN{exit !(r>=m)}'; then ok=$((ok+1)); else ok=0; fi
  [ "$ok" -ge 2 ] && break
  [ $(( $(date +%s) - t0 )) -ge "$MAXWAIT" ] && { echo "window never cleared; firing anyway"; break; }
  sleep 45
done
cd /root/repo
SPARK_SCALA_VERSION=2.13 sbt -batch "runMain graft.ScalingBench gen:400000 -2,-8 ${REPS} $RUN_ID"
