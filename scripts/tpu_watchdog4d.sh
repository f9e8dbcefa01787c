#!/bin/bash
# Fires tpu_run4d.sh once the probe grants AND no other campaign holds
# the pidfile (tpu_run4d.sh itself also waits on the pidfile).
while true; do
  echo "=== 4d probe attempt $(date) ===" >> /tmp/tpu_probe4d.log
  if timeout 2400 python /root/repo/scripts/tpu_probe.py >> /tmp/tpu_probe4d.log 2>&1; then
    break
  fi
  sleep 180
done
bash /root/repo/scripts/tpu_run4d.sh > /root/repo/scripts/tpu_run4d.log 2>&1
