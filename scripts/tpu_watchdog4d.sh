#!/bin/bash
# Fires tpu_run4d.sh (ntt_level qualification + v2 ladder + 2^20
# profile) after the wave-3 campaign releases the chip. Waits on the
# campaign pidfile BEFORE probing so two processes never share the
# tunnel; tpu_run4d.sh re-checks the pidfile itself.
while [ -f /root/repo/scripts/.tpu_campaign.pid ] && \
      kill -0 "$(cat /root/repo/scripts/.tpu_campaign.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
while true; do
  echo "=== 4d probe attempt $(date) ===" >> /tmp/tpu_probe4d.log
  if timeout 2400 python /root/repo/scripts/tpu_probe.py >> /tmp/tpu_probe4d.log 2>&1; then
    break
  fi
  sleep 120
done
bash /root/repo/scripts/tpu_run4d.sh > /root/repo/scripts/tpu_run4d.log 2>&1
