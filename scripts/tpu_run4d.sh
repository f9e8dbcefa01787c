#!/bin/bash
# Round-4 wave-4: qualify the v2 NTT level kernel (ntt_level) on real
# Mosaic, then re-measure the NTT ladder with it default-on, plus the
# 2^20 profile that decides the next optimization round. Queues behind
# any campaign holding the chip (pidfile).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOGDIR=/root/repo/scripts/run4d_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
BUDGET=${HODOR_CAMPAIGN_BUDGET_S:-9000}
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

# (0) the missing north-star record: the 2^20-row quadratic-VDF prove.
# Wave 3's two attempts died on (a) a transport flake and (b) the
# mid-trace eager device twiddle build (fixed: tables are host-built
# now). v2 stays OFF here — known-good kernel set for the record;
# retry adds the OOM mitigations.
if ! HODOR_NTT_V2=0 BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 4800 python bench.py; then
  HODOR_NTT_V2=0 HODOR_LDE_SEQ_MIN=27 HODOR_FRI_EAGER=1 \
    BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 4800 python bench.py
fi

# (1) qualify the new kernels (separate process per attempt; retries inside)
step 240 2400 python scripts/tpu_qualify.py --retry-failed ntt_level
step 120 900 python scripts/tpu_qualify.py --pending-as-fail ntt_level
step 240 2400 python scripts/tpu_qualify.py --retry-failed ntt_level_s8
step 120 900 python scripts/tpu_qualify.py --pending-as-fail ntt_level_s8
timeout 60 python scripts/tpu_qualify.py --finalize

# (2) NTT ladder with the qualified default set (v2 engages when the
# manifest says yes); HODOR_NTT_V2=0 control at 2^16 for the same session
NTT_REPS=20 step 300 3600 python scripts/tpu_bench.py ntt 16
HODOR_NTT_V2=0 NTT_REPS=20 step 300 3600 python scripts/tpu_bench.py ntt 16
NTT_REPS=10 step 300 3600 python scripts/tpu_bench.py ntt 20
step 600 4800 python scripts/tpu_bench.py ntt 24

# (3) where does the 2^20 transform actually spend time (drives the
# next kernel round: layout vs epilogue vs dot)
step 400 3600 python scripts/tpu_bench.py profile 20

# (4) a 2^16-row prove with the v2 default engaged, then the same prove
# with synced stages for TRUTHFUL per-stage attribution (totals from
# the second run are distorted by the pipeline stalls — use the first)
BENCH_MODE=prove BENCH_LOG_ROWS=16 step 1200 7200 python bench.py
HODOR_SYNC_STAGES=1 BENCH_MODE=prove BENCH_LOG_ROWS=16 step 600 7200 python bench.py

echo "=== tpu_run4d done ==="
