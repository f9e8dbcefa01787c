"""TPU perf/verification driver for round-2 NTT work. Each subcommand is one
process so a hung remote Mosaic compile only kills that step (the shell
driver wraps each in `timeout`).

Subcommands:
  expected   CPU backend: Pease NTT 2^12 ground truth -> /tmp/ntt_expected.npz
  check      TPU: matmul NTT (pallas wide-reduce) + Pease (pallas v2 mul)
             at 2^12 vs the CPU ground truth
  ntt N      TPU: time matmul NTT at 2^N
  pease N    TPU: time Pease NTT at 2^N
  kernels    TPU: standalone pallas v2 mul / addsub / wide-reduce at 2^20
  profile N  TPU: jax.profiler trace one matmul NTT, aggregate op durs
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_hodor_tpu")
)

import numpy as np

EXPECTED = "/tmp/ntt_expected.npz"
LOG_SMALL = 12


def _rand_input(log_n, n16, num_bits, seed=0):
    rng = np.random.default_rng(seed)
    limbs = rng.integers(0, 1 << 16, size=(1 << log_n, n16), dtype=np.uint32)
    top_bits = num_bits - 16 * (n16 - 1)
    limbs[:, -1] &= (1 << max(top_bits - 1, 1)) - 1
    return limbs


def cmd_expected():
    jax.config.update("jax_platforms", "cpu")
    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt import ntt

    ops = ops_for(F_STARK)
    x = _rand_input(LOG_SMALL, ops.n16, F_STARK.num_bits)
    out = np.asarray(jax.device_get(jax.jit(lambda a: ntt(ops, a))(x)))
    np.savez(EXPECTED, x=x, out=out)
    print(f"expected saved: {out.shape}")


def cmd_check():
    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt import ntt
    from hodor_tpu.ntt.matmul import ntt_matmul

    ops = ops_for(F_STARK)
    d = np.load(EXPECTED)
    x, exp = d["x"], d["out"]
    print(f"backend: {jax.devices()[0]}")
    for name, fn in [("matmul", ntt_matmul), ("pease", ntt)]:
        t0 = time.time()
        out = np.asarray(jax.device_get(jax.jit(lambda a, f=fn: f(ops, a))(x)))
        ok = (out == exp).all()
        print(f"{name} 2^{LOG_SMALL}: {'OK' if ok else 'MISMATCH'} ({time.time()-t0:.1f}s incl compile)")
        if not ok:
            bad = np.argwhere(out != exp)
            print(f"  first mismatches: {bad[:5].tolist()}")


def _timed_chain(jfn, x, reps):
    """Wall time of `reps` CHAINED applications (each consumes the
    previous output, so no runtime can overlap, dedupe, or skip them)
    plus one 1-element fetch that forces the whole chain to have
    actually executed. The fetch and dispatch costs are constant, so
    differencing two rep counts cancels them (see _time_ntt)."""
    y = x
    t0 = time.time()
    for _ in range(reps):
        y = jfn(y)
    y.block_until_ready()
    np.asarray(jax.device_get(y[0, 0]))
    return time.time() - t0


def _time_ntt(log_n, kernel_name):
    """Honest per-transform wall: run4d step_8 recorded 0.04 ms at 2^16
    for the v1 path — physically impossible (its int32 column
    intermediates alone are >4x the HBM SOL) — because independent
    queued executions let the tunnel runtime report before the work
    drained. Chained reps + rep-count differencing cannot be gamed:
    T(R) = overhead + R*per_transform, so per = (T(2R) - T(R)) / R."""
    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt import ntt
    from hodor_tpu.ntt.matmul import ntt_matmul

    ops = ops_for(F_STARK)
    fn = {"matmul": ntt_matmul, "pease": ntt}[kernel_name]
    x = jax.device_put(_rand_input(log_n, ops.n16, F_STARK.num_bits))
    jfn = jax.jit(lambda a: fn(ops, a))
    t0 = time.time()
    jfn(x).block_until_ready()
    print(f"# compile+first {time.time()-t0:.1f}s")
    reps = int(os.environ.get("NTT_REPS", "5" if log_n <= 20 else "3"))
    # warm the fetch path too: the eager y[0,0] slice is its own remote
    # compile (~8 s first use) — it must never land inside a timed run
    # (run5 step_8: T(20) included it and the difference went negative)
    _timed_chain(jfn, x, 1)
    t1 = _timed_chain(jfn, x, reps)
    t2 = _timed_chain(jfn, x, 2 * reps)
    if t2 < t1:  # transient stall polluted t1; remeasure once
        t1 = _timed_chain(jfn, x, reps)
    dt = max((t2 - t1) / reps, 1e-9)
    muls = (1 << log_n) // 2 * log_n
    print(
        f"# chained walls: T({reps})={t1*1e3:.1f} ms T({2*reps})={t2*1e3:.1f} ms"
    )
    print(
        f"{kernel_name} ntt 2^{log_n}: {dt*1e3:.2f} ms, {muls/dt:.3e} field-muls/s"
    )


def _time_ntt_batch(log_n, batch):
    """B transforms in ONE jitted program (leading batch axis): separates
    per-dispatch overhead (tunnel RTT, XLA launch) from per-byte device
    cost. If ms/transform here is far below the single-transform number,
    the single-transform wall is dispatch-bound, not HBM/MXU-bound."""
    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt.matmul import ntt_matmul

    ops = ops_for(F_STARK)
    rng = np.random.default_rng(5)
    xs = np.stack([_rand_input(log_n, ops.n16, F_STARK.num_bits) for _ in range(batch)])
    x = jax.device_put(xs)
    jfn = jax.jit(lambda a: ntt_matmul(ops, a))
    t0 = time.time()
    jfn(x).block_until_ready()
    print(f"# compile+first {time.time()-t0:.1f}s")
    reps = int(os.environ.get("NTT_REPS", "5"))
    t1 = _timed_chain(jfn, x, reps)
    t2 = _timed_chain(jfn, x, 2 * reps)
    dt = max((t2 - t1) / reps, 1e-9) / batch
    muls = (1 << log_n) // 2 * log_n
    print(
        f"matmul ntt 2^{log_n} x{batch}: {dt*1e3:.2f} ms/transform, "
        f"{muls/dt:.3e} field-muls/s"
    )


def cmd_kernels():
    import jax.numpy as jnp

    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.field.pallas_kernels import (
        pallas_addsub,
        pallas_mont_mul_v2,
    )

    ops = ops_for(F_STARK)
    n = 1 << 20
    a = jax.device_put(_rand_input(20, ops.n16, F_STARK.num_bits, seed=1))
    b = jax.device_put(_rand_input(20, ops.n16, F_STARK.num_bits, seed=2))

    for name, fn in [
        ("mul_v2", lambda x, y: pallas_mont_mul_v2(F_STARK, x, y)),
        ("add", lambda x, y: pallas_addsub(F_STARK, x, y, "add")),
    ]:
        jfn = jax.jit(fn)
        t0 = time.time()
        jfn(a, b).block_until_ready()
        print(f"# {name} compile {time.time()-t0:.1f}s")
        t0 = time.time()
        out = None
        for _ in range(20):
            out = jfn(a, b)
        out.block_until_ready()
        dt = (time.time() - t0) / 20
        print(f"{name} 2^20 elements: {dt*1e3:.3f} ms, {n/dt:.3e} field-ops/s")


def cmd_fri(log_h1):
    """Time + profile the FRI pair ladder (h1 = 2^log_h1, h2 = 2*h1) on
    random Montgomery values — the 2^16-row prove spends 74% of its warm
    wall here (3.35s of 4.5s, run4 step_24), so this isolates whether
    that is fold kernels, per-round tree hashing, or dispatch."""
    import glob
    import gzip
    import json as js

    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.fri.fri import NaiveFriIop

    ops = ops_for(F_STARK)
    h1 = jax.device_put(_rand_input(log_h1, ops.n16, F_STARK.num_bits, seed=11))
    h2 = jax.device_put(_rand_input(log_h1 + 1, ops.n16, F_STARK.num_bits, seed=12))

    def run():
        p1, p2 = NaiveFriIop.proofs_from_lde_pair(h1, h2, 16, 1, F_STARK)
        return p1, p2

    t0 = time.time()
    run()
    print(f"# fri pair compile+first {time.time()-t0:.1f}s")
    reps = int(os.environ.get("NTT_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    print(f"fri pair h1=2^{log_h1}: {dt*1e3:.1f} ms/ladder-pair")

    tdir = "/tmp/hodor_trace_fri"
    jax.profiler.start_trace(tdir)
    run()
    jax.profiler.stop_trace()
    traces = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if traces:
        with gzip.open(traces[-1], "rt") as f:
            data = js.load(f)
        durs = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                durs[name] = durs.get(name, 0) + ev["dur"]
        total = sum(durs.values())
        print(f"total traced {total/1e3:.2f} ms")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {d/1e3:9.3f} ms  {name[:110]}")


def cmd_profile(log_n):
    import glob
    import gzip
    import json as js

    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt.matmul import ntt_matmul

    ops = ops_for(F_STARK)
    x = jax.device_put(_rand_input(log_n, ops.n16, F_STARK.num_bits))
    jfn = jax.jit(lambda a: ntt_matmul(ops, a))
    jfn(x).block_until_ready()
    tdir = "/tmp/hodor_trace"
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        out = jfn(x)
    out.block_until_ready()
    jax.profiler.stop_trace()
    traces = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("no trace found")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = js.load(f)
    durs = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] = durs.get(name, 0) + ev["dur"]
    total = sum(durs.values())
    print(f"total traced {total/1e3:.2f} ms over 3 reps")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {d/1e3:9.3f} ms  {name[:110]}")


def cmd_all():
    """One process, everything: correctness check, kernel timings, NTT
    sweep, profile - amortizes the (slow, flaky) axon backend init."""
    t0 = time.time()
    print(f"backend: {jax.devices()[0]} (init {time.time()-t0:.1f}s)", flush=True)
    cmd_check()
    cmd_kernels()
    for log_n in (16, 18, 20):
        _time_ntt(log_n, "matmul")
    cmd_profile(16)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "expected":
        cmd_expected()
    elif cmd == "check":
        cmd_check()
    elif cmd == "ntt":
        _time_ntt(int(sys.argv[2]), "matmul")
    elif cmd == "pease":
        _time_ntt(int(sys.argv[2]), "pease")
    elif cmd == "kernels":
        cmd_kernels()
    elif cmd == "fri":
        cmd_fri(int(sys.argv[2]))
    elif cmd == "nttb":
        _time_ntt_batch(int(sys.argv[2]), int(sys.argv[3]))
    elif cmd == "fused":
        # EXPERIMENTAL single-kernel dot+reduce path (pallas_dft_reduce)
        os.environ["HODOR_NTT_FUSED"] = "1"
        _time_ntt(int(sys.argv[2]), "matmul")
    elif cmd == "profile":
        cmd_profile(int(sys.argv[2]))
    elif cmd == "all":
        cmd_all()
    else:
        raise SystemExit(f"unknown cmd {cmd}")
