#!/bin/bash
# Round-4 TPU campaign. Addresses VERDICT round-3 items 2/3/4/9:
#   - every step gets ONE automatic retry when its output shows a
#     transient remote-compile transport error (HTTP 5xx, closed body,
#     UNAVAILABLE...) — round 3 lost the batched-prove bench and the
#     dft_reduce qualification to exactly such flakes;
#   - high-value steps (qualification, fused ladder, the 2^18/2^20-row
#     proves, batched prove) run BEFORE low-value extras (profiling);
#     round 3 skipped the north-star proves on budget while profiling
#     ran anyway;
#   - qualification re-attempts kernels recorded False by prior rounds
#     (--retry-failed), so round 3's flake-failed dft_reduce gets its
#     second chance before the fused ladder is measured.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
QUAL=/root/repo/scripts/pallas_qual.json
LOGDIR=/root/repo/scripts/run4_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
BUDGET=${HODOR_CAMPAIGN_BUDGET_S:-18000}
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

# step <min_needed_s> <timeout_s> cmd...
#   skip when the remaining budget can't fit it; on failure, retry ONCE
#   iff the step log shows a transient transport marker AND the budget
#   still fits. Returns the (last) command rc so callers can chain
#   OOM-specific fallbacks.
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

# chip mutex: the driver-invoked bench.py waits on this pidfile
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# ground truth for the correctness check (CPU backend, fast)
[ -f /tmp/ntt_expected.npz ] || step 120 900 python scripts/tpu_bench.py expected

# (1) kernel qualification with per-kernel processes (a hung Mosaic
# compile kills only its kernel) and retry of prior-round failures.
# dft_reduce now qualifies at its DEPLOYED shape (m=512, fused twiddle);
# the no-twiddle m=128 variant that HTTP-500'd round 3 is the separate
# dft_reduce_notw diagnostic.
for k in addsub mul wide_reduce blake2s fri_fold s8dot dft_reduce dft_reduce_bf16 dft_reduce_notw; do
  step 240 1800 python scripts/tpu_qualify.py --retry-failed "$k"
  step 120 900 python scripts/tpu_qualify.py --pending-as-fail "$k"
done
timeout 60 python scripts/tpu_qualify.py --finalize
cat "$QUAL"

# (2) qualified-default 2^16 headline (fused dot+reduce engages by
# default when its manifest entry is true) + correctness check
step 300 2400 python scripts/tpu_bench.py ntt 16
BENCH_LOG_N=16 step 120 2400 python bench.py
step 400 2400 python scripts/tpu_bench.py check
# comparison point: fused explicitly off (round-3 wide_reduce path)
HODOR_NTT_FUSED=0 step 300 2400 python scripts/tpu_bench.py ntt 16

# (4) NORTH-STAR PROVES (VERDICT item 3) — before any extras.
BENCH_MODE=prove BENCH_LOG_ROWS=14 step 900 7200 python bench.py
BENCH_MODE=prove BENCH_LOG_ROWS=16 step 1200 7200 python bench.py
if ! BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1500 9000 python bench.py; then
  HODOR_LDE_SEQ_MIN=27 BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1500 9000 python bench.py
fi
if ! BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi
if ! BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi

# (5) batched-prove throughput (VERDICT item 9): B=8 at 2^12 and 2^14
BENCH_BATCH=8 BENCH_MODE=prove BENCH_LOG_ROWS=12 step 900 7200 python bench.py
BENCH_BATCH=8 BENCH_MODE=prove BENCH_LOG_ROWS=14 step 1200 7200 python bench.py

# (6) scale ladder with the final qualified kernel set
step 600 3600 python scripts/tpu_bench.py ntt 20
step 600 3600 python scripts/tpu_bench.py ntt 22
step 900 4800 python scripts/tpu_bench.py ntt 24

# (7) extras, strictly last
step 300 2400 python scripts/tpu_bench.py profile 16

echo "=== tpu_run4 done ==="
