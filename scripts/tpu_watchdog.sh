#!/bin/bash
# Retry the minimal TPU probe until the axon pool grants the chip, then
# run the full TPU campaign (scripts/tpu_run2.sh -> tpu_run3.sh).
# The probe script lives in the repo so this survives machine resets.
while true; do
  echo "=== probe attempt $(date) ===" >> /tmp/tpu_probe.log
  if timeout 2400 python /root/repo/scripts/tpu_probe.py >> /tmp/tpu_probe.log 2>&1; then
    echo "=== probe OK $(date) ===" >> /tmp/tpu_probe.log
    break
  fi
  sleep 120
done
bash /root/repo/scripts/tpu_run2.sh > /root/repo/scripts/tpu_run2.log 2>&1
