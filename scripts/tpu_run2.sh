#!/bin/bash
# Round-2 TPU run #2: one consolidated process for NTT work (init is
# slow/flaky - amortize it), then the prove bench in its own process.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH  # keep /root/.axon_site first? no: append ours

timeout 600  python scripts/tpu_bench.py expected
timeout 5400 python scripts/tpu_bench.py all
BENCH_MODE=prove BENCH_LOG_ROWS=14 timeout 5400 python bench.py
echo "=== tpu_run2 done ==="
