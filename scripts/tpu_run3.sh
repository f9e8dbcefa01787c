#!/bin/bash
# Round-3 TPU campaign. Ordered so SOMETHING lands even if a later step
# hangs: (1) qualify every Pallas kernel on real Mosaic with per-kernel
# gating (VERDICT item 2), (2) cheap NTT numbers, (3) scale ladder
# 2^20/2^22/2^24 (first-ever, VERDICT item 1), (4) proves up to the
# reference's 2^20-row headline (item 3), (5) profile.
# One process per step: a hung remote Mosaic compile only kills its step.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
QUAL=/root/repo/scripts/pallas_qual.json

# chip mutex: the driver-invoked bench.py waits on this pidfile instead
# of colliding with the campaign (one TPU process at a time); the
# campaign's own bench calls skip the wait via BENCH_IN_CAMPAIGN
echo $$ > /root/repo/scripts/.tpu_campaign.pid
trap 'rm -f /root/repo/scripts/.tpu_campaign.pid' EXIT
export BENCH_IN_CAMPAIGN=1

# ground truth for the correctness check (CPU backend, fast)
timeout 900  python scripts/tpu_bench.py expected

# GUARANTEED EARLY NUMBER: the pure-XLA matmul NTT (round-1-proven
# compile, no Mosaic risk) lands a 2^16 chip measurement before the
# qualification pass, which can take up to ~1h if remote Mosaic compiles
# hang. If the grant window is short, at least this is recorded.
HODOR_DISABLE_PALLAS=1 timeout 2400 python scripts/tpu_bench.py check
HODOR_DISABLE_PALLAS=1 timeout 2400 python scripts/tpu_bench.py ntt 16
HODOR_DISABLE_PALLAS=1 BENCH_LOG_N=16 timeout 2400 python bench.py

# ---- kernel qualification (no HODOR_PALLAS_QUAL in env yet!) ----
timeout 2700 python scripts/tpu_qualify.py
# per-kernel retry of anything the first pass never reached; a kernel
# that HUNG pass 1 is recorded failed rather than retried
for k in addsub mul wide_reduce blake2s fri_fold dft_reduce; do
  timeout 1500 python scripts/tpu_qualify.py --pending-as-fail "$k"
done
timeout 60 python scripts/tpu_qualify.py --finalize
cat "$QUAL"

# all subsequent steps dispatch only qualified kernels
export HODOR_PALLAS_QUAL=$QUAL

# correctness at 2^12 vs CPU ground truth, with the qualified set engaged
timeout 2400 python scripts/tpu_bench.py check

# cheap numbers first (2^16 compile is persistently cached from round 1)
timeout 2400 python scripts/tpu_bench.py ntt 16
BENCH_LOG_N=16 timeout 2400 python bench.py

# scale ladder (BASELINE.json configs[2]; first-ever numbers here)
timeout 3600 python scripts/tpu_bench.py ntt 20
timeout 3600 python scripts/tpu_bench.py ntt 22
timeout 4800 python scripts/tpu_bench.py ntt 24

# end-to-end proves: 2^14 warm-up shape, then 2^16, then the
# reference's headline 2^20-row quadratic + cubic VDF
BENCH_MODE=prove BENCH_LOG_ROWS=14 timeout 7200  python bench.py
BENCH_MODE=prove BENCH_LOG_ROWS=16 timeout 7200  python bench.py
# 2^20 rows -> h1=2^24, h2=2^25: HBM is tight (BASELINE.md §memory);
# tree-dropping is on by default, and if the one-program ladder OOMs,
# retry with the per-round eager ladder (HODOR_FRI_EAGER)
# 2^18 rows: the batched-coset stage1 LDE sits just under the
# sequential threshold and is the big temp consumer on CPU buffer
# assignment (34 GiB; BASELINE.md §memory) — if the TPU assignment
# also OOMs, retry with the cosets serialized (HODOR_LDE_SEQ_MIN)
if ! BENCH_MODE=prove BENCH_LOG_ROWS=18 timeout 9000 python bench.py; then
  HODOR_LDE_SEQ_MIN=27 BENCH_MODE=prove BENCH_LOG_ROWS=18 timeout 9000 python bench.py
fi
if ! BENCH_MODE=prove BENCH_LOG_ROWS=20 timeout 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_MODE=prove BENCH_LOG_ROWS=20 timeout 10800 python bench.py
fi
if ! BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 timeout 10800 python bench.py; then
  HODOR_FRI_EAGER=1 BENCH_WORKLOAD=cubic BENCH_MODE=prove BENCH_LOG_ROWS=20 timeout 10800 python bench.py
fi

# batched-prove throughput at a small shape (dispatch-floor amortization)
BENCH_BATCH=8 BENCH_MODE=prove BENCH_LOG_ROWS=12 timeout 7200 python bench.py

# experimental fused dot+reduce (only if it qualified; harmless if not)
HODOR_NTT_FUSED=1 timeout 2400 python scripts/tpu_bench.py fused 16
HODOR_NTT_FUSED=1 timeout 3600 python scripts/tpu_bench.py fused 20

# profile the 2^16 NTT for BASELINE.md
timeout 2400 python scripts/tpu_bench.py profile 16

echo "=== tpu_run3 done ==="
