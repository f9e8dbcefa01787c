#!/bin/bash
# Round-3 TPU campaign, budget-aware. Rounds are short (~1h wall) and
# every compile on a fresh machine is COLD (5-15 min via the remote
# compile service), so steps are ordered by evidence-value-per-minute
# and each expensive step is skipped once the remaining budget can't
# plausibly fit it: (1) a GUARANTEED pure-XLA 2^16 chip number, (2)
# Mosaic qualification of every Pallas kernel with per-kernel gating
# (VERDICT item 2), (3) the qualified 2^16 headline + correctness check,
# (4) scale ladder 2^20/2^22/2^24 (VERDICT item 1), (5) proves up to the
# reference's 2^20-row headline (item 3), (6) extras.
# One process per step: a hung remote Mosaic compile only kills its step.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
QUAL=/root/repo/scripts/pallas_qual.json
T0=$(date +%s)
BUDGET=${HODOR_CAMPAIGN_BUDGET_S:-6600}   # free the chip before the
                                          # driver's end-of-round bench
                                          # stops waiting on the pidfile
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }
# step <min_needed_s> <timeout_s> cmd... : skip when the budget can't fit it
step() {
  local need=$1 to=$2; shift 2
  if (( $(left) < need )); then echo "SKIP (budget $(left)s < ${need}s): $*"; return 0; fi
  timeout "$to" "$@"
}

# chip mutex: the driver-invoked bench.py waits on this pidfile instead
# of colliding with the campaign (one TPU process at a time); the
# campaign's own bench calls skip the wait via BENCH_IN_CAMPAIGN
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# ground truth for the correctness check (CPU backend, fast)
[ -f /tmp/ntt_expected.npz ] || step 120 900 python scripts/tpu_bench.py expected

# (1) GUARANTEED EARLY NUMBER: the pure-XLA matmul NTT (round-1-proven
# compile, no Mosaic risk) lands a 2^16 chip measurement first.
HODOR_DISABLE_PALLAS=1 step 300 2400 python scripts/tpu_bench.py ntt 16
HODOR_DISABLE_PALLAS=1 BENCH_LOG_N=16 step 120 2400 python bench.py

# (2) kernel qualification. HODOR_PALLAS_QUAL must NOT name the manifest
# here (tpu_qualify.py sets the "none" sentinel itself); a kernel that
# HUNG pass 1 is recorded failed rather than retried.
step 600 2700 python scripts/tpu_qualify.py
for k in addsub mul wide_reduce blake2s fri_fold dft_reduce; do
  step 300 1200 python scripts/tpu_qualify.py --pending-as-fail "$k"
done
timeout 60 python scripts/tpu_qualify.py --finalize
cat "$QUAL"
# all subsequent steps (and any later process on this machine, incl. the
# driver's bench.py) auto-detect $QUAL via limbs._pallas_enabled

# (3) the qualified-kernel headline + correctness at 2^12 vs CPU truth
step 300 2400 python scripts/tpu_bench.py ntt 16
BENCH_LOG_N=16 step 120 2400 python bench.py
step 400 2400 python scripts/tpu_bench.py check

# (4) scale ladder (BASELINE.json configs[2]; first-ever numbers here)
step 600 3600 python scripts/tpu_bench.py ntt 20
step 600 3600 python scripts/tpu_bench.py ntt 22
step 900 4800 python scripts/tpu_bench.py ntt 24

# (5) end-to-end proves: 2^14 warm-up shape, then 2^16, then the
# reference's headline 2^20-row quadratic + cubic VDF
BENCH_MODE=prove BENCH_LOG_ROWS=14 step 1200 7200 python bench.py
BENCH_MODE=prove BENCH_LOG_ROWS=16 step 1500 7200 python bench.py
# 2^18 rows: batched-coset stage1 is the big temp consumer (BASELINE.md
# §memory) — on OOM retry with the cosets serialized
if ! BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1800 9000 python bench.py; then
  HODOR_LDE_SEQ_MIN=27 BENCH_MODE=prove BENCH_LOG_ROWS=18 step 1800 9000 python bench.py
fi
# 2^20 rows -> h1=2^24, h2=2^25: tree-dropping is on by default; if the
# one-program ladder OOMs, retry with the per-round eager ladder
if ! BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi
if ! BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 step 2400 10800 python bench.py
fi

# (6) extras: batched-prove throughput, experimental fused dot+reduce
# (only if it qualified; harmless if not), profile
BENCH_BATCH=8 BENCH_MODE=prove BENCH_LOG_ROWS=12 step 1200 7200 python bench.py
HODOR_NTT_FUSED=1 step 600 2400 python scripts/tpu_bench.py fused 16
HODOR_NTT_FUSED=1 step 600 3600 python scripts/tpu_bench.py fused 20
step 300 2400 python scripts/tpu_bench.py profile 16

echo "=== tpu_run3 done ==="
