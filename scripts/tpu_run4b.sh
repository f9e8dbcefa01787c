#!/bin/bash
# Round-4 follow-up campaign: re-attempts of measurements the main run
# (tpu_run4.sh) lost to OOMs whose retry envs were incomplete. Lesson
# recorded from the main run: the 2^18-row prove OOM'd in the FRI pair
# even after serializing the stage1 cosets — the two mitigations
# (HODOR_LDE_SEQ_MIN for stage1 temp, HODOR_FRI_EAGER for ladder temp)
# must be COMBINED on real-TPU buffer assignment, which runs hotter than
# the CPU memory_analysis numbers in BASELINE.md.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOGDIR=/root/repo/scripts/run4b_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
BUDGET=${HODOR_CAMPAIGN_BUDGET_S:-10800}
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
STEP_N=0
step() {
  local need=$1 to=$2; shift 2
  STEP_N=$((STEP_N + 1))
  local log="$LOGDIR/step_${STEP_N}.log"
  if (( $(left) < need )); then echo "SKIP (budget $(left)s < ${need}s): $*"; return 0; fi
  timeout "$to" "$@" 2>&1 | tee "$log"
  local rc=${PIPESTATUS[0]}
  if (( rc != 0 )) && (( $(left) >= need )) && grep -qiE \
      '500|response body|UNAVAILABLE|DEADLINE|socket closed|connection (reset|refused)|tpu_compile_helper|broken pipe' \
      "$log"; then
    echo "RETRY (transient marker in $log, rc=$rc): $*"
    sleep 30
    timeout "$to" "$@" 2>&1 | tee "${log%.log}_retry.log"
    rc=${PIPESTATUS[0]}
  fi
  return "$rc"
}

# wait for the main campaign to release the chip
while [ -f /root/repo/scripts/.tpu_campaign.pid ] && \
      kill -0 "$(cat /root/repo/scripts/.tpu_campaign.pid 2>/dev/null)" 2>/dev/null; do
  echo "main campaign holds the chip; waiting 120s"; sleep 120
done
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# 2^18-row prove with BOTH memory mitigations from the start
HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 BENCH_MODE=prove BENCH_LOG_ROWS=18 \
  step 1500 9000 python bench.py

# 2^20-row proves, both mitigations (the main run's plain attempt lost
# its remote compile to an HTTP 500 and the eager retry may also have
# run out of budget). The main run's 2^20 stage1 compile 500'd twice —
# if that reproduces, fall back to the pre-fused kernel set
# (HODOR_NTT_FUSED=0) to isolate whether the newly-default fused
# dft_reduce variant at 2^20 shapes is what the remote Mosaic rejects.
if ! HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 BENCH_MODE=prove BENCH_LOG_ROWS=20 \
    step 2400 10800 python bench.py; then
  HODOR_NTT_FUSED=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
    BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi
HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 \
  step 2400 10800 python bench.py

# batched-prove throughput if the main run missed it
BENCH_BATCH=8 BENCH_MODE=prove BENCH_LOG_ROWS=12 step 900 7200 python bench.py

# fused scale ladder if the main run missed it
step 600 3600 python scripts/tpu_bench.py ntt 20
step 900 4800 python scripts/tpu_bench.py ntt 24

# dispatch-vs-device discrimination: 50-rep and 8-batched 2^16 NTTs.
# If ms/transform collapses vs the 5-rep single number, the single-
# transform wall is dispatch overhead (tunnel RTT / launch), not HBM.
NTT_REPS=50 step 300 2400 python scripts/tpu_bench.py ntt 16
step 400 3600 python scripts/tpu_bench.py nttb 16 8

# FRI ladder isolation: 74% of the 2^16-row prove's warm wall is the
# fri pair (run4 step_24); time + device-trace it at prove scale
step 600 4800 python scripts/tpu_bench.py fri 20

echo "=== tpu_run4b done ==="
