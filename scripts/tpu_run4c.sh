#!/bin/bash
# Round-4 third campaign wave. Ordering rationale:
#   (1) cheap discrimination measurements FIRST — the 2^16 NTT profile
#       showed ~0.9 ms device time inside a 5.9-8.5 ms wall, so 50-rep /
#       8-batched runs decide whether the headline is dispatch-bound;
#   (2) the FRI-pair isolation trace (74% of the 2^16-row prove wall);
#   (3) the 2^18/2^20-row proves, now with the interleave-transpose fix
#       (the u32[R,2^20,16,16] 8x-padded 16 GiB HLO temp that killed
#       every 2^20 stage1 compile is row-chunked away) and device-built
#       FRI omega tables (the >=256 MB host upload that killed the 2^18
#       prove at runtime is gone).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOGDIR=/root/repo/scripts/run4c_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
BUDGET=${HODOR_CAMPAIGN_BUDGET_S:-14400}
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
      'response body|UNAVAILABLE|DEADLINE|socket closed|connection (reset|refused)|broken pipe' \
      "$log"; then
    echo "RETRY (transient marker in $log, rc=$rc): $*"
    sleep 30
    timeout "$to" "$@" 2>&1 | tee "${log%.log}_retry.log"
    rc=${PIPESTATUS[0]}
  fi
  return "$rc"
}

while [ -f /root/repo/scripts/.tpu_campaign.pid ] && \
      kill -0 "$(cat /root/repo/scripts/.tpu_campaign.pid 2>/dev/null)" 2>/dev/null; do
  echo "another campaign holds the chip; waiting 120s"; sleep 120
done
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# (0) qualify the v2 level kernel (ntt_level): cheap, and when it
# passes the manifest flips v2 default-on for every later step —
# including the proves, whose per-level HBM traffic it cuts ~2x and
# whose stage1 MLIR it shrinks (the 87 MB stage1 program was mostly
# encode/layout plumbing the v2 path deletes)
step 240 2400 python scripts/tpu_qualify.py --retry-failed ntt_level
step 120 900 python scripts/tpu_qualify.py --pending-as-fail ntt_level
timeout 60 python scripts/tpu_qualify.py --finalize

# (1) dispatch-vs-device discrimination; the first step doubles as the
# v2 measurement at 2^16 (cold compile if just qualified), the
# HODOR_NTT_V2=0 control isolates the kernel's contribution
NTT_REPS=50 step 240 2400 python scripts/tpu_bench.py ntt 16
HODOR_NTT_V2=0 NTT_REPS=20 step 240 2400 python scripts/tpu_bench.py ntt 16
step 300 3600 python scripts/tpu_bench.py nttb 16 8
NTT_REPS=20 step 300 3600 python scripts/tpu_bench.py ntt 20

# (2) FRI pair isolation at prove scale
step 600 4800 python scripts/tpu_bench.py fri 20

# (3) proves with the interleave + omega-table fixes; first attempt
# runs the qualified default kernel set (v2 if it just qualified), the
# retry is maximally conservative (v2 off + serialized LDE + eager FRI)
if ! BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1200 9000 python bench.py; then
  HODOR_NTT_V2=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
    BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1200 9000 python bench.py
fi
if ! BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_NTT_V2=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
    BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi
if ! BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_NTT_V2=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
    BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi

# (4) v2 at scale + the profile that drives the next kernel round
step 600 4800 python scripts/tpu_bench.py ntt 24
step 400 3600 python scripts/tpu_bench.py profile 20

echo "=== tpu_run4c done ==="
