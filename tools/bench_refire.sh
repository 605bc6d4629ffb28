#!/bin/bash
# Waits for a probe-clean window (two consecutive one-shot tmpfs dd reads
# >= MIN_GBPS), then runs graft.Bench at sf0.1 and archives the JSON line
# plus the probe readings around the run. Usage:
#   bash tools/bench_refire.sh <tag> [minGBps] [maxWaitSec]
TAG=${1:?tag}
MIN=${2:-2.0}
MAXWAIT=${3:-2700}
t0=$(date +%s)
ok=0
while true; do
  r=$(dd if=/dev/zero of=/dev/shm/ddprobe_bf bs=1M count=2048 conv=fdatasync 2>&1 | tail -1 | grep -oE '[0-9.]+ GB/s' | grep -oE '[0-9.]+')
  rm -f /dev/shm/ddprobe_bf
  r=${r:-0}
  echo "$(date +%H:%M:%S) probe ${r} GB/s (need >= $MIN x2)"
  if awk -v r="$r" -v m="$MIN" 'BEGIN{exit !(r>=m)}'; then ok=$((ok+1)); else ok=0; fi
  [ "$ok" -ge 2 ] && break
  [ $(( $(date +%s) - t0 )) -ge "$MAXWAIT" ] && { echo "window never cleared; firing anyway"; break; }
  sleep 45
done
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_SCALA_VERSION=2.13 \
  sbt -batch "runMain graft.Bench" 2>&1 | tee "tools/bench_${TAG}_raw.log" | \
  grep -oE '\{"metric".*' | tail -1 > "tools/bench_${TAG}.json"
# post-run probe reading, appended for the record
r=$(dd if=/dev/zero of=/dev/shm/ddprobe_bf bs=1M count=2048 conv=fdatasync 2>&1 | tail -1 | grep -oE '[0-9.]+ [MG]B/s')
rm -f /dev/shm/ddprobe_bf
echo "$(date +%H:%M:%S) post-run probe $r"
echo "wrote tools/bench_${TAG}.json"
