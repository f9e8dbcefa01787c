#!/bin/bash
# Round-4 wave-3 watchdog: retry the minimal probe until the axon pool
# grants the chip, then run scripts/tpu_run4c.sh (the 2^18/2^20-row
# prove re-measurements with the interleave + omega-table fixes).
while true; do
  echo "=== probe attempt $(date) ===" >> /tmp/tpu_probe.log
  if timeout 2400 python /root/repo/scripts/tpu_probe.py >> /tmp/tpu_probe.log 2>&1; then
    echo "=== probe OK $(date) ===" >> /tmp/tpu_probe.log
    break
  fi
  sleep 120
done
bash /root/repo/scripts/tpu_run4c.sh > /root/repo/scripts/tpu_run4c.log 2>&1
