#!/bin/bash
# Round-5 wave-4: the 2^20-row prove with the FRI eager ladder (wave-3
# step_1 reached FRI execution — every earlier stage now compiles AND
# runs at 2^20 with v2 — and exhausted HBM inside the one-program FRI
# pair; HODOR_FRI_EAGER=1 is the designed per-round escape hatch).
# Then FRI attribution, cubic, batch, NTT ladder.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOGDIR=/root/repo/scripts/run5k_steps
mkdir -p "$LOGDIR"
T0=$(date +%s)
DEADLINE=${HODOR_CAMPAIGN_DEADLINE:-$(( T0 + ${HODOR_CAMPAIGN_BUDGET_S:-10800} ))}
left() { echo $(( DEADLINE - $(date +%s) )); }
STEP_N=0
step() {
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
  if (( $(left) < 900 )); then echo "deadline while queued; aborting"; exit 0; fi
  echo "another campaign holds the chip; waiting 120s"; sleep 120
done
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# (1) quad 2^20 with the GROUPED FRI ladder (new default >= 2^23):
# ~8 multi-round programs instead of 85 per-round ones; temps bounded
# per group. Expect the 786 s FRI stage to collapse toward the pair's
# per-byte rate.
step 1800 7200 env BENCH_MODE=prove BENCH_LOG_ROWS=20 python bench.py
timeout 60 python scripts/pick_preferred.py 'quadratic_vdf_2.20_rows_prove_wall_s'

# (2) CubicVDF 2^20, grouped + sequential cosets
HODOR_LDE_SEQ_MIN=27 BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 1800 7200 python bench.py

# (3) finish the batch table
BENCH_BATCH=4 BENCH_MODE=prove BENCH_LOG_ROWS=16 step 1200 4800 python bench.py
BENCH_BATCH=2 BENCH_MODE=prove BENCH_LOG_ROWS=18 step 900 4800 python bench.py

# (4) honest NTT ladder
NTT_REPS=20 step 240 2400 python scripts/tpu_bench.py ntt 16
HODOR_NTT_V2=0 NTT_REPS=20 step 240 2400 python scripts/tpu_bench.py ntt 16
NTT_REPS=10 step 240 2400 python scripts/tpu_bench.py ntt 20
NTT_REPS=5 step 300 3600 python scripts/tpu_bench.py ntt 24

# (5) compile-overlap + NTT profile
step 300 2400 python scripts/par_compile_test.py
step 400 3600 python scripts/tpu_bench.py profile 20

echo "=== tpu_run5k done ($(left)s before deadline) ==="
