#!/bin/bash
# Probe the axon TPU tunnel until it comes back; exit 0 when up.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 180 python _tpu_probe.py > /tmp/tpu_probe_last.log 2>&1; then
    echo "TPU_UP after attempt $i at $(date)" | tee /tmp/tpu_up.flag
    exit 0
  fi
  echo "attempt $i down at $(date)" >> /tmp/tpu_watch.log
  sleep 600
done
exit 1
