#!/bin/bash
# Round-2 TPU run #1: validate pallas paths on chip, baseline timings,
# profile. Each step its own process under timeout so a hung remote
# Mosaic compile cannot stall the whole campaign.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH  # keep /root/.axon_site (axon plugin)
T=timeout
P="python scripts/tpu_bench.py"

$T 600  $P expected          # CPU ground truth
$T 1800 $P check             # both kernels on chip at 2^12 vs ground truth
$T 1800 $P kernels           # standalone pallas v2 mul / add at 2^20
$T 1800 $P ntt 16
$T 1800 $P ntt 18
$T 2400 $P ntt 20
$T 1800 $P profile 16
echo "=== tpu_run1 done ==="
