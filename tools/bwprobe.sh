#!/bin/bash
# logs tmpfs dd bandwidth every 120s to tools/bwprobe.log
while true; do
  r=$(dd if=/dev/zero of=/dev/shm/ddprobe_bg bs=1M count=2048 conv=fdatasync 2>&1 | tail -1 | grep -oE '[0-9.]+ [MG]B/s')
  rm -f /dev/shm/ddprobe_bg
  echo "$(date +%H:%M:%S) $r" >> /root/repo/tools/bwprobe.log
  sleep 120
done
