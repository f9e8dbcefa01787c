#!/bin/bash
# Round-5 wave-1 chip campaign. Headline goals (VERDICT r04):
#   1. the 2^20-row quadratic-VDF prove (configs[3]) with the round-5
#      memory fixes (chunked powers, scalar-scale tw tiles, v2 vmem cap)
#   2. requalify the v2 NTT level kernels at DEPLOYED tile counts
#   3. honest (chained+differenced) NTT ladder, v2 on vs off
#   4. synced-stage 2^18 prove for truthful attribution
#
# HARD DEADLINE (VERDICT r04 item 2): the campaign computes an absolute
# exit time at launch (HODOR_CAMPAIGN_DEADLINE as a unix epoch, or
# start + HODOR_CAMPAIGN_BUDGET_S, default 10800 s) and releases the
# chip pidfile by then NO MATTER WHAT — the driver's round-end bench
# must never starve again (round 4 lost its BENCH record to a campaign
# that spanned the boundary).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOGDIR=/root/repo/scripts/run5_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
DEADLINE=${HODOR_CAMPAIGN_DEADLINE:-$(( T0 + ${HODOR_CAMPAIGN_BUDGET_S:-10800} ))}
left() { echo $(( DEADLINE - $(date +%s) )); }
STEP_N=0
step() {
  # step <min-seconds-needed> <timeout> cmd...: skip when the deadline
  # is closer than min-seconds; cap the timeout at the time remaining.
  local need=$1 to=$2; shift 2
  STEP_N=$((STEP_N + 1))
  local log="$LOGDIR/step_${STEP_N}.log"
  local rem; rem=$(left)
  if (( rem < need )); then echo "SKIP (deadline in ${rem}s < ${need}s): $*"; return 0; fi
  if (( to > rem )); then to=$rem; fi
  timeout "$to" "$@" 2>&1 | tee "$log"
  local rc=${PIPESTATUS[0]}
  if (( rc != 0 )) && (( $(left) >= need )) && grep -qiE \
      'response body|UNAVAILABLE|DEADLINE|socket closed|connection (reset|refused)|broken pipe' \
      "$log"; then
    echo "RETRY (transient marker in $log, rc=$rc): $*"
    sleep 30
    local rem2; rem2=$(left); if (( to > rem2 )); then to=$rem2; fi
    (( to > 0 )) && timeout "$to" "$@" 2>&1 | tee "${log%.log}_retry.log"
    rc=${PIPESTATUS[0]}
  fi
  return "$rc"
}

while [ -f /root/repo/scripts/.tpu_campaign.pid ] && \
      kill -0 "$(cat /root/repo/scripts/.tpu_campaign.pid 2>/dev/null)" 2>/dev/null; do
  if (( $(left) < 600 )); then echo "deadline while queued; aborting"; exit 0; fi
  echo "another campaign holds the chip; waiting 120s"; sleep 120
done
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# (1) requalify every kernel whose code or call layout changed this
# round: the v2 pair (vmem cap + new deployed-shape checks) and the v1
# fused pair (tw_tiles wrap index map). --reset drops the stale `true`s.
timeout 60 python scripts/tpu_qualify.py --reset ntt_level ntt_level_s8 dft_reduce dft_reduce_bf16 dft_reduce_notw
step 600 3600 python scripts/tpu_qualify.py ntt_level
step 120 900  python scripts/tpu_qualify.py --pending-as-fail ntt_level
step 400 2400 python scripts/tpu_qualify.py ntt_level_s8
step 120 900  python scripts/tpu_qualify.py --pending-as-fail ntt_level_s8
step 400 2400 python scripts/tpu_qualify.py dft_reduce dft_reduce_bf16 dft_reduce_notw
step 120 900  python scripts/tpu_qualify.py --pending-as-fail dft_reduce dft_reduce_bf16 dft_reduce_notw
timeout 60 python scripts/tpu_qualify.py --finalize

# (2) honest NTT walls at 2^16: v2 default (if qualified) vs v2 off.
# Chained+differenced timing (tpu_bench._time_ntt) — the run4d 0.40 ms /
# 0.04 ms pair was dispatch-gamed; these are the real numbers.
NTT_REPS=20 step 300 3600 python scripts/tpu_bench.py ntt 16
HODOR_NTT_V2=0 NTT_REPS=20 step 300 3600 python scripts/tpu_bench.py ntt 16
NTT_REPS=10 step 300 3600 python scripts/tpu_bench.py ntt 20
step 400 4800 python scripts/tpu_bench.py ntt 24

# (3) THE headline: 2^20-row quadratic-VDF prove. v2 allowed if
# qualified; retry ladder degrades v2 -> LDE_SEQ + eager FRI.
if ! BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 6000 python bench.py; then
  if ! HODOR_NTT_V2=0 BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 6000 python bench.py; then
    HODOR_NTT_V2=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
      BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 6000 python bench.py
  fi
fi
# record the newest successful prove JSON as the driver-preferred line
timeout 60 python scripts/pick_preferred.py quadratic_vdf_2.20_rows_prove_wall_s

# (4) truthful 2^18 stage attribution (drives the 15x end-to-end work)
HODOR_SYNC_STAGES=1 BENCH_MODE=prove BENCH_LOG_ROWS=18 step 900 5400 python bench.py

echo "=== tpu_run5 done ($(left)s before deadline) ==="
