"""Qualify every Pallas kernel on the REAL Mosaic compiler before it is
allowed to gate a hot path (VERDICT round-2 item 2).

All six kernels were validated only in interpret mode until a chip was
available; round 1 saw a simpler kernel hang the remote Mosaic compile
for >20 min, so a production prove must never be the first thing to
exercise a kernel on hardware. This script compiles + bit-checks each
kernel against the pure-jnp path on small shapes and records pass/fail
in a JSON table (default scripts/pallas_qual.json) that
hodor_tpu.field.limbs._pallas_enabled() consumes via HODOR_PALLAS_QUAL:
a kernel that failed (or whose entry is still "pending" because the
compile hung and the outer `timeout` killed this process) degrades to
the jnp fallback instead of taking down the prove.

The file is written INCREMENTALLY: "pending" before each attempt, then
true/false. Run under `timeout`; rerun with the partial file present to
attempt only missing kernels (prior true/false entries are kept;
--pending-as-fail records hung kernels as failed; --finalize converts
everything non-true to false without touching the device).

IMPORTANT: do NOT set HODOR_PALLAS_QUAL in this process's env - the
dispatch gates would read the half-written table and route the "actual"
side to the jnp path, vacuously passing every check.
"""

import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_hodor_tpu")
)
# "none" sentinel (not just unset): limbs._pallas_enabled auto-detects
# the default manifest when the var is absent, which would route the
# "actual" side of every check to the jnp path mid-qualification
os.environ["HODOR_PALLAS_QUAL"] = "none"

import numpy as np

QUAL_PATH = os.environ.get(
    "HODOR_QUAL_OUT", os.path.join(os.path.dirname(__file__), "pallas_qual.json")
)

KERNELS = [
    "addsub", "mul", "wide_reduce", "blake2s", "fri_fold",
    "s8dot",          # diagnostic: in-kernel int8 MXU dot alone
    "dft_reduce",     # fused dot+reduce, native s8 contraction (deployed shape)
    "dft_reduce_bf16",  # fused dot+reduce, chunked-bf16 contraction
    "dft_reduce_notw",  # diagnostic: the no-twiddle m=128 variant
    "ntt_level",      # v2 level kernel: u32-native, resident plane-W, ring acc
    "ntt_level_s8",   # v2 with the native int8 in-kernel dot (~2x bf16 MXU)
]


def _load():
    try:
        with open(QUAL_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save(table):
    tmp = QUAL_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1)
    os.replace(tmp, QUAL_PATH)


def _rand_limbs(rng, shape, field):
    n16 = shape[-1]
    limbs = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    top_bits = field.num_bits - 16 * (n16 - 1)
    limbs[..., -1] &= (1 << max(top_bits - 1, 1)) - 1
    return limbs


def _eq(a, b):
    return bool((np.asarray(jax.device_get(a)) == np.asarray(jax.device_get(b))).all())


def check_addsub(field, ops):
    from hodor_tpu.field.pallas_kernels import pallas_addsub

    rng = np.random.default_rng(10)
    a = jax.device_put(_rand_limbs(rng, (4096, ops.n16), field))
    b = jax.device_put(_rand_limbs(rng, (4096, ops.n16), field))
    for mode in ("add", "sub"):
        got = jax.jit(lambda x, y, m=mode: pallas_addsub(field, x, y, m))(a, b)
        ref = getattr(ops, mode)(a, b, allow_pallas=False)
        if not _eq(got, ref):
            return False
    return True


def check_mul(field, ops):
    from hodor_tpu.field.pallas_kernels import pallas_mont_mul_v2

    rng = np.random.default_rng(11)
    a = jax.device_put(_rand_limbs(rng, (4096, ops.n16), field))
    b = jax.device_put(_rand_limbs(rng, (4096, ops.n16), field))
    got = jax.jit(lambda x, y: pallas_mont_mul_v2(field, x, y))(a, b)
    ref = ops.mul(a, b, allow_pallas=False)
    return _eq(got, ref)


def check_wide_reduce(field, ops):
    # exercised through one radix-128 DFT level: pallas path (module
    # default on TPU) vs the pure-jnp wide reduce (_FORCE_PALLAS="off")
    from hodor_tpu.ntt import matmul as mm

    rng = np.random.default_rng(12)
    x = jax.device_put(_rand_limbs(rng, (32, 128, ops.n16), field))
    try:
        mm._FORCE_FUSED = "off"  # isolate wide_reduce from the fused kernel
        mm._FORCE_PALLAS = "off"
        ref = jax.jit(lambda a: mm._dft_matmul(ops, a, 128, False))(x)
        ref.block_until_ready()
        mm._FORCE_PALLAS = None
        got = jax.jit(lambda a: mm._dft_matmul(ops, a, 128, False))(x)
        return _eq(got, ref)
    finally:
        mm._FORCE_PALLAS = None
        mm._FORCE_FUSED = None


def check_blake2s(field, ops):
    from hodor_tpu.merkle import blake2s as b2

    rng = np.random.default_rng(13)
    m = jax.device_put(rng.integers(0, 1 << 32, size=(4096, 16), dtype=np.uint64).astype(np.uint32))
    try:
        b2._FORCE_PALLAS = "off"
        ref = jax.jit(lambda w: b2.hash_block(w, 32))(m)
        ref.block_until_ready()
        b2._FORCE_PALLAS = None
        got = jax.jit(lambda w: b2.hash_block(w, 32))(m)
        return _eq(got, ref)
    finally:
        b2._FORCE_PALLAS = None


def check_fri_fold(field, ops):
    from hodor_tpu.fri import fri as fr

    rng = np.random.default_rng(14)
    values = jax.device_put(_rand_limbs(rng, (8192, ops.n16), field))
    omegas_inv = jax.device_put(_rand_limbs(rng, (4096, ops.n16), field))
    challenge = jax.device_put(_rand_limbs(rng, (ops.n16,), field))
    try:
        fr._FORCE_PALLAS = "off"
        ref = jax.jit(lambda v, c, w: fr._fold_round_body(ops, v, c, 1, w))(
            values, challenge, omegas_inv
        )
        ref.block_until_ready()
        fr._FORCE_PALLAS = None
        got = jax.jit(lambda v, c, w: fr._fold_round_body(ops, v, c, 1, w))(
            values, challenge, omegas_inv
        )
        return _eq(got, ref)
    finally:
        fr._FORCE_PALLAS = None


def _check_dft_reduce_impl(field, ops, impl, with_tw=True, m=512):
    """Qualify the fused dot+reduce kernel AT ITS DEPLOYED SHAPE.

    Round-3 lesson: qualification ran the (m=128, no-twiddle) variant —
    a (m_tiles=1) kernel instance the NTT ladder NEVER invokes — and its
    deterministic Mosaic HTTP-500 gated the kernel off, while the
    variant the 2^16+ NTT actually compiles (m=512 batch, fused level
    twiddle) ran fine an hour later (tpu_run2.log:485, 5.74 ms). Every
    radix-128 level of every transform >= 2^14 calls the fused kernel
    with a twiddle and m a multiple of 512, so THAT is the shape whose
    compile result should gate the manifest."""
    from hodor_tpu.ntt import matmul as mm

    rng = np.random.default_rng(15)
    x = jax.device_put(_rand_limbs(rng, (m, 128, ops.n16), field))
    tw = (
        jax.device_put(_rand_limbs(rng, (m, 128, ops.n16), field))
        if with_tw
        else None
    )
    try:
        mm._FORCE_PALLAS = "off"
        mm._FORCE_FUSED = "off"
        ref = jax.jit(lambda a: mm._dft_matmul(ops, a, 128, False, tw=tw))(x)
        ref.block_until_ready()
        mm._FORCE_PALLAS = "off"  # isolate the fused kernel itself
        mm._FORCE_FUSED = None
        mm._FUSED_IMPL = impl
        os.environ["HODOR_NTT_FUSED"] = "1"
        got = jax.jit(lambda a: mm._dft_matmul(ops, a, 128, False, tw=tw))(x)
        return _eq(got, ref)
    finally:
        mm._FORCE_PALLAS = None
        mm._FORCE_FUSED = None
        mm._FUSED_IMPL = None
        os.environ.pop("HODOR_NTT_FUSED", None)


def check_dft_reduce(field, ops):
    return _check_dft_reduce_impl(field, ops, "s8")


def check_dft_reduce_bf16(field, ops):
    return _check_dft_reduce_impl(field, ops, "bf16c")


def check_dft_reduce_notw(field, ops):
    """Diagnostic, gates nothing: the (m=128, no-twiddle) variant that
    HTTP-500'd the remote Mosaic compile in rounds 3-4. Only the
    top-level n==128 transform would ever hit this instance; recording
    its compile status separately keeps the deployed-shape manifest
    entry (dft_reduce) from being poisoned by it."""
    return _check_dft_reduce_impl(field, ops, "s8", with_tw=False, m=128)


def check_ntt_level(field, ops, impl="bf16"):
    """v2 level kernel (pallas_ntt_level) at BOTH deployed variants:
    the fused-twiddle inner-level shape (m=512) and the no-twiddle
    top-level shape (m=128). One manifest entry gates both (the
    dispatch in ntt.matmul uses the kernel for either), so both Mosaic
    compiles must succeed and bit-match the kernel-free path."""
    from hodor_tpu.ntt import matmul as mm

    rng = np.random.default_rng(18)
    try:
        mm._V2_IMPL = impl
        # m = 8192 (m_tiles = 64) is the shape class that OOM'd scoped
        # vmem in run4d while m_tiles = 4 passed — qualification must
        # cover the DEPLOYED tile counts, not just a small stand-in.
        # "scale" exercises the tw_tiles = 1 wrap (iNTT 1/N fold).
        for with_tw, m in ((True, 512), (False, 128), (True, 8192),
                           ("scale", 512)):
            x = jax.device_put(_rand_limbs(rng, (m, 128, ops.n16), field))
            if with_tw == "scale":
                tw = jax.device_put(_rand_limbs(rng, (ops.n16,), field))
            elif with_tw:
                tw = jax.device_put(_rand_limbs(rng, (m, 128, ops.n16), field))
            else:
                tw = None
            mm._FORCE_PALLAS = "off"
            mm._FORCE_FUSED = "off"
            mm._FORCE_V2 = False
            ref = jax.jit(lambda a, t=tw: mm._dft_matmul(ops, a, 128, False, tw=t))(x)
            ref.block_until_ready()
            mm._FORCE_V2 = None
            os.environ["HODOR_NTT_V2"] = "1"
            os.environ["HODOR_PALLAS_QUAL"] = "none"
            # _FORCE_V2 None + manifest "none" would gate v2 off; force it
            mm._FORCE_V2 = "on"
            got = jax.jit(lambda a, t=tw: mm._dft_matmul(ops, a, 128, False, tw=t))(x)
            if not _eq(got, ref):
                return False
        return True
    finally:
        mm._FORCE_PALLAS = None
        mm._FORCE_FUSED = None
        mm._FORCE_V2 = None
        mm._V2_IMPL = None
        os.environ.pop("HODOR_NTT_V2", None)
        os.environ["HODOR_PALLAS_QUAL"] = "none"


def check_ntt_level_s8(field, ops):
    return check_ntt_level(field, ops, impl="s8")


def check_s8dot(field, ops):
    """Diagnostic, gates nothing: a minimal Pallas kernel whose body is
    ONLY an int8 dot_general. Round 3's dft_reduce failed the remote
    Mosaic compile with an opaque HTTP 500; this isolates whether the
    in-kernel int8 matmul is the construct the compiler rejects."""
    from functools import partial

    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(16)
    a = rng.integers(-128, 128, size=(128, 512), dtype=np.int8)
    b = rng.integers(-128, 128, size=(512, 128), dtype=np.int8)
    got = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32)
    )(jax.device_put(a), jax.device_put(b))
    ref = a.astype(np.int32) @ b.astype(np.int32)
    return _eq(got, ref)


CHECKS = {
    "addsub": check_addsub,
    "mul": check_mul,
    "wide_reduce": check_wide_reduce,
    "blake2s": check_blake2s,
    "fri_fold": check_fri_fold,
    "s8dot": check_s8dot,
    "dft_reduce": check_dft_reduce,
    "dft_reduce_bf16": check_dft_reduce_bf16,
    "dft_reduce_notw": check_dft_reduce_notw,
    "ntt_level": check_ntt_level,
    "ntt_level_s8": check_ntt_level_s8,
}

# Transient remote-compile failures (VERDICT round-3 item 2: round 3
# recorded dft_reduce FAILED on an HTTP 500 from the compile service;
# the same kernel compiled fine an hour later). A genuine Mosaic reject
# reproduces deterministically; a transport flake does not — retry those.
_TRANSIENT_MARKERS = (
    "500",
    "response body",
    "unavailable",
    "deadline",
    "socket closed",
    "connection reset",
    "connection refused",
    "internal error",
    "tpu_compile_helper",
    "broken pipe",
    "timed out",
)


def _is_transient(exc: Exception) -> bool:
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _run_check_with_retry(name, field, ops, attempts=3, backoff_s=45):
    last_exc = None
    for attempt in range(1, attempts + 1):
        try:
            return CHECKS[name](field, ops), None
        except Exception as e:  # Mosaic reject, OOM, shape error, flake
            last_exc = e
            if attempt < attempts and _is_transient(e):
                print(
                    f"{name}: transient failure (attempt {attempt}/{attempts}), "
                    f"retrying in {backoff_s}s: {type(e).__name__}: {e}",
                    flush=True,
                )
                time.sleep(backoff_s)
                backoff_s *= 2
                continue
            return False, e
    return False, last_exc


def main():
    # --pending-as-fail: a "pending" entry means a previous pass HUNG on
    # this kernel's Mosaic compile; record it false instead of burning
    # this pass's timeout on it again.
    # --finalize: no device work; convert any non-true entry to false so
    # the table is a clean allowlist for HODOR_PALLAS_QUAL consumers.
    pending_as_fail = "--pending-as-fail" in sys.argv
    # --retry-failed: re-attempt kernels recorded False by a PRIOR run
    # (a transport flake in an earlier round must not permanently gate a
    # kernel off; a real Mosaic reject will simply fail again).
    retry_failed = "--retry-failed" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")]

    # --reset: drop the prior result for the named kernels (use after a
    # kernel's code or check changes — a stale `true` would otherwise
    # gate the NEW kernel on without it ever compiling on hardware).
    if "--reset" in sys.argv:
        table = _load()
        for name in only or KERNELS:
            table.pop(name, None)
        _save(table)
        print(json.dumps(table), flush=True)
        return 0

    if "--finalize" in sys.argv:
        table = _load()
        for name in KERNELS:
            table[name] = table.get(name) is True
        _save(table)
        print(json.dumps(table), flush=True)
        return 0

    from hodor_tpu.field import F_STARK, ops_for

    ops = ops_for(F_STARK)
    print(f"backend: {jax.devices()[0]}", flush=True)
    if jax.default_backend() == "cpu":
        print("refusing to qualify on CPU backend (would record interpret-mode results)")
        return 1

    table = _load()
    for name in only or KERNELS:
        prior = table.get(name)
        if prior is True or (prior is False and not retry_failed):
            print(f"{name}: kept prior result {prior}", flush=True)
            continue
        if prior == "pending" and pending_as_fail:
            table[name] = False
            _save(table)
            print(f"{name}: pending from a hung pass -> FAIL", flush=True)
            continue
        table[name] = "pending"
        _save(table)
        t0 = time.time()
        ok, exc = _run_check_with_retry(name, F_STARK, ops)
        if exc is not None:
            print(f"{name}: EXCEPTION {type(exc).__name__}: {exc}", flush=True)
        table[name] = bool(ok)
        _save(table)
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)", flush=True)
    print(json.dumps(table), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
