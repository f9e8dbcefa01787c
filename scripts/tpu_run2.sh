#!/bin/bash
# Round-2 TPU run #2: one consolidated process for NTT work (init is
# slow/flaky - amortize it), then the prove bench in its own process,
# then fallbacks so SOME number lands even if a kernel path hangs the
# remote Mosaic compile.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 600  python scripts/tpu_bench.py expected
# one cheap timing FIRST so a number lands even if a later kernel hangs
# the consolidated `all` process
timeout 2400 python scripts/tpu_bench.py ntt 16
timeout 7200 python scripts/tpu_bench.py all
# first numbers at reference-benchmark scale (BASELINE.json configs[2])
timeout 3600 python scripts/tpu_bench.py ntt 22
timeout 3600 python scripts/tpu_bench.py ntt 24
BENCH_MODE=prove BENCH_LOG_ROWS=14 timeout 7200 python bench.py
BENCH_MODE=prove BENCH_LOG_ROWS=16 timeout 7200 python bench.py
# fallbacks: jnp-only reduce path (no pallas) and the Pease kernel
HODOR_DISABLE_PALLAS=1 BENCH_LOG_N=16 timeout 2400 python bench.py
timeout 2400 python scripts/tpu_bench.py pease 16
# experimental single-kernel dot+reduce (last: must not cost the main
# numbers anything if the Mosaic compile hangs)
timeout 2400 python scripts/tpu_bench.py fused 16
timeout 2400 python scripts/tpu_bench.py fused 20
# the reference's run_on_stable.sh headline workload (cubic VDF)
BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=14 timeout 7200 python bench.py
echo "=== tpu_run2 done ==="
