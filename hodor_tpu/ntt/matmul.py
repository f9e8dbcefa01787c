"""MXU matmul-based NTT: radix-128 four-step with lazy Montgomery
reduction.

The reference's radix-4 kernel (src/fft/radix4_fft/mod.rs) chases
arithmetic intensity on a CPU; the TPU-native answer is to put the DFT
butterflies on the MXU: a size-128 DFT is a 128x128 field matrix
multiply, and a length-N NTT is log_128(N) levels of batched DFT-128s
with elementwise twiddles in between (the four-step decomposition,
same structure as parallel_fft, src/fft/fft.rs:68-125).

Field matmul via limb planes: operands decompose into 8-bit byte planes
(P = 2*L planes). One dot_general contracts the 128-length reduction
dim over all plane pairs at once - (B*P, B) @ (B, M*P) - with exact
integer accumulation (products < 2^16, 128-term sums < 2^23, safe in
int32 and even in f32's 24-bit mantissa so the MXU can run it). A
second tiny dot folds the (P, P) plane grid into base-256 columns of
the full 512-bit integer sum_j W[k,j]*x[j], and ONE wide Montgomery
reduction per output element maps it back to 16-bit-limb Montgomery
form - amortizing what the elementwise path pays per multiply over an
entire 128-point dot product.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..domain import Domain, log2_floor
from ..field.field import Field
from ..field.limbs import (
    LimbOps,
    MASK16,
    _carry_propagate,
    _carryless_mul_cols_trunc,
    _mul_cols,
    int_to_limbs,
    ops_for,
)

RADIX = 128


# ------------------------------------------------------------ constants

@lru_cache(maxsize=None)
def _plane_conv_matrix(p: int) -> np.ndarray:
    """(p*p, 2p-1) 0/1: plane pair (i, j) feeds base-256 column i+j."""
    e = np.zeros((p * p, 2 * p - 1), dtype=np.int32)
    for i in range(p):
        for j in range(p):
            e[i * p + j, i + j] = 1
    return e


@lru_cache(maxsize=None)
def _dft_matrix_folded_s8(field: Field, size: int, inverse: bool):
    """Constants for the fused s8-MXU DFT: the byte-plane matrix with the
    plane convolution folded into the W side.

    Returns (w_s8, w_sum, cnt):
      w_s8 : (size, C, size, P) int8, entries w_byte[k, j, c-q] - 128
             (zero where c-q is out of [0, P))
      w_sum: (size, C) int32, sum of the (unshifted) w bytes per (k, c)
      cnt  : (C,) int32, number of (j, q) contraction terms per column
    with P = 2*n16 byte planes and C = 2P-1 output base-256 columns.
    """
    planes = _dft_matrix_bytes(field, size, inverse)  # (S, S, P) f32 bytes
    w = planes.astype(np.int64)  # (S, S, P)
    s = size
    P = w.shape[-1]
    C = 2 * P - 1
    w_fold = np.zeros((C, s, s, P), dtype=np.int64)
    for c in range(C):
        for q in range(P):
            p_idx = c - q
            if 0 <= p_idx < P:
                w_fold[c, :, :, q] = w[:, :, p_idx]
    w_sum = w_fold.sum(axis=(2, 3)).astype(np.int32)  # (C, S)
    w_s8 = (w_fold - 128).astype(np.int8)
    # out-of-range (p_idx invalid) entries were 0 -> become -128; they must
    # contribute exactly -128*(x-128) so the correction terms cancel them:
    # the algebra below treats EVERY (j, q) pair as a term, with w byte 0
    # for invalid pairs - that is exactly what w_fold already encodes, and
    # w_sum / cnt count all s*P pairs per column.
    cnt = np.full((C,), s * P, dtype=np.int32)
    return w_s8, w_sum, cnt


@lru_cache(maxsize=None)
def _dft_matrix_bytes(field: Field, size: int, inverse: bool):
    """(size, size, P) f32 byte planes of the Montgomery-form DFT matrix
    W[k, j] = w^(k*j) (w = generator of the size-`size` domain)."""
    domain = Domain.new_for_size(field, size)
    w = domain.generator_inv if inverse else domain.generator
    p_mod = field.p
    n16 = field.n16
    rows = np.zeros((size, size, n16), dtype=np.uint32)
    # W[k, j] = w^(kj) in Montgomery form
    pow_table = [field.to_mont(pow(w, t, p_mod)) for t in range(size)]
    idx = np.outer(np.arange(size), np.arange(size)) % size
    packed = np.stack([int_to_limbs(v, n16) for v in pow_table])  # (size, n16)
    rows = packed[idx]  # (size, size, n16)
    lo = rows & 0xFF
    hi = (rows >> 8) & 0xFF
    planes = np.stack([lo, hi], axis=-1).reshape(size, size, 2 * n16)
    return planes.astype(np.float32)


@lru_cache(maxsize=None)
def _level_twiddles(field: Field, n: int, n1: int, inverse: bool):
    """(n1, n//n1, L) Montgomery twiddles w_N^(k1*j2) for the four-step
    recombination. Built ON HOST (numpy ints): the previous eager
    device-powers build ran mid-trace on the axon backend and OOM'd the
    2^20-row prove the moment HBM was full of live prove state (campaign
    wave-3 step_6: ResourceExhausted inside jnp.asarray during the
    first LDE's trace) — trace-time code must never touch the device."""
    return _strided_twiddles(field, n, n1, n // n1, 1, inverse)


@lru_cache(maxsize=None)
def _strided_twiddles(field: Field, n: int, n1: int, count: int, step: int,
                      inverse: bool):
    """(n1, count, L) Montgomery table T[k1, i] = w_N^(k1 * step * i)."""
    domain = Domain.new_for_size(field, n)
    w = domain.generator_inv if inverse else domain.generator
    n16 = field.n16
    out = np.zeros((n1, count, n16), dtype=np.uint32)
    for k1 in range(n1):
        base = pow(w, k1 * step, field.p)
        v = 1
        for i in range(count):
            out[k1, i] = int_to_limbs(field.to_mont(v), n16)
            v = v * base % field.p
    return out


# twiddle tables above this element count are not embedded as XLA
# literals (a (n1*n2, L) u32 literal is 1 GiB at N=2^24 - fatal for the
# tunnel compile service, and even 64 MB at 2^20 bloats the shipped
# HLO); they are built in-graph from two small strided factors at the
# cost of one extra (Pallas-fused) elementwise mul
_TW_LITERAL_MAX = 1 << 18


def _level_twiddles_traced(ops: LimbOps, n: int, n1: int, inverse: bool):
    """(n1, n2, L) twiddle array for the top recombination level - a
    host literal when small, else the in-graph product of two strided
    factors w^(k1*s*a) * w^(k1*b) (j2 = a*s + b)."""
    n2 = n // n1
    if n1 * n2 <= _TW_LITERAL_MAX:
        return jnp.asarray(_level_twiddles(ops.field, n, n1, inverse))
    s = 1 << (log2_floor(n2) // 2)
    assert n2 % s == 0
    t_lo = jnp.asarray(_strided_twiddles(ops.field, n, n1, s, 1, inverse))
    t_hi = jnp.asarray(_strided_twiddles(ops.field, n, n1, n2 // s, s, inverse))
    prod = ops.mul(t_hi[:, :, None, :], t_lo[:, None, :, :])  # (n1, n2/s, s, L)
    return prod.reshape(n1, n2, ops.n16)


@lru_cache(maxsize=None)
def max_radix(field: Field) -> int:
    """Largest power-of-2 radix r such that r * p^2 fits the 2n-limb
    intermediate (r * p^2 < 2^(32*n16))."""
    r = 128
    bound = 1 << (32 * field.n16)
    while r > 1 and r * field.p * field.p >= bound:
        r //= 2
    return r


@lru_cache(maxsize=None)
def _reduction_chain(field: Field, radix: int):
    """Conditional-subtract multiples (as limb arrays) bringing
    u < radix*p^2/R + p down below p, derived from exact integer bounds."""
    p = field.p
    bound = radix * p * p // field.R + p + 1
    mults = []
    while bound > p:
        m = 1
        while 2 * m * p < bound:
            m *= 2
        mults.append(m)
        bound = max(bound - m * p, m * p)
    n16 = field.n16
    return tuple(np.asarray(int_to_limbs(m * p, n16)) for m in mults)


# ------------------------------------------------------------ kernels

def _to_byte_planes_f32(x):
    """(..., L) u16-limbs -> (..., 2L) f32 byte planes."""
    lo = (x & jnp.uint32(0xFF)).astype(jnp.float32)
    hi = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=-1).reshape(x.shape[:-1] + (2 * x.shape[-1],))


def _mont_reduce_wide(ops: LimbOps, cols, radix: int):
    """cols: (..., K) base-256 relaxed columns (uint32, each < 2^31) of an
    integer t < radix * p^2. Returns t * R^-1 mod p as (..., n16)
    Montgomery limbs. One base-256 carry chain + the standard m/mp steps
    + a bound-derived chain of conditional subtractions."""
    n = ops.n16
    k = cols.shape[-1]
    # fold base-256 columns into relaxed 16-bit columns in O(1) depth:
    # t = sum_i A_i*2^(16i) + 256*sum_i B_i*2^(16i) with A = even cols,
    # B = odd cols; limb_i = A_i + (B_i & 0xFF)<<8 + (B_{i-1} >> 8)
    # (bounds: < 2^30 + 2^16 + 2^22 < 2^31), then ONE 2n-step carry chain.
    pad = jnp.zeros(cols.shape[:-1] + (4 * n - k,), jnp.uint32)
    colsp = jnp.concatenate([cols, pad], axis=-1)  # (..., 4n)
    A = colsp[..., 0::2]  # (..., 2n)
    B = colsp[..., 1::2]
    b_hi = jnp.concatenate(
        [jnp.zeros(B.shape[:-1] + (1,), jnp.uint32), (B >> 8)[..., :-1]], axis=-1
    )
    relaxed = A + ((B & jnp.uint32(0xFF)) << 8) + b_hi
    t16 = _carry_propagate(relaxed, 2 * n)  # (..., 2n) proper 16-bit limbs

    # m = (t mod R) * p' mod R ; u = (t + m*p) / R
    t_lo = t16[..., :n]
    pinv = jnp.broadcast_to(ops.pinv_limbs, t_lo.shape)
    m = _carry_propagate(_carryless_mul_cols_trunc(t_lo, pinv, n), n)
    mp_cols = _mul_cols(m, jnp.broadcast_to(ops.p_limbs, m.shape))
    u = _carry_propagate(t16 + mp_cols, 2 * n)[..., n:]

    from ..field.limbs import _sub_with_borrow

    for mult in _reduction_chain(ops.field, radix):
        diff, borrow = _sub_with_borrow(u, jnp.broadcast_to(jnp.asarray(mult), u.shape))
        u = jnp.where((borrow == 0)[..., None], diff, u)
    return u


@lru_cache(maxsize=None)
def _dft_matrix_planes_v2(field: Field, size: int, inverse: bool,
                          dot_impl: str = "bf16"):
    """(P*size, size) plane matrix for the v2 level kernel: row
    (qi*size + k), column j holds byte qi of W[k, j] (P = 2*n16 byte
    planes). Bytes <= 255 are exact in bf16; the "s8" variant stores
    byte-128 for the native int8 MXU dot (corrections in-kernel)."""
    import ml_dtypes

    planes = _dft_matrix_bytes(field, size, inverse)  # (S, S, P) f32 bytes
    w2 = np.transpose(planes, (2, 0, 1)).reshape(-1, size)  # (P*S, S)
    if dot_impl == "s8":
        return np.ascontiguousarray(
            (w2.astype(np.int32) - 128).astype(np.int8)
        )
    return np.ascontiguousarray(w2.astype(ml_dtypes.bfloat16))


# test hook: None = auto (real TPU only); "interpret" forces the Pallas
# wide-reduce path in interpret mode so CPU tests can cover it
_FORCE_PALLAS = None

# EXPERIMENTAL fused dot+reduce kernel (pallas_dft_reduce): None = only
# when HODOR_NTT_FUSED is set AND on real TPU; "interpret" forces the
# interpret-mode kernel for CPU tests
_FORCE_FUSED = None

# v2 level kernel (pallas_ntt_level): None = auto (qualified + real
# TPU); "interpret" forces interpret mode for CPU tests; "on" forces the
# real kernel regardless of the manifest (qualification); False disables
_FORCE_V2 = None

# v2 in-kernel dot: None = auto (s8 when "ntt_level_s8" qualified, else
# bf16); "s8"/"bf16" force one (tests, HODOR_NTT_V2_IMPL)
_V2_IMPL = None


def _v2_dot_impl() -> str:
    import os

    from ..field.limbs import _pallas_enabled as _pe

    if _V2_IMPL in ("s8", "bf16"):
        return _V2_IMPL
    env = os.environ.get("HODOR_NTT_V2_IMPL")
    if env in ("s8", "bf16"):
        return env
    return "s8" if _pe("ntt_level_s8") else "bf16"

# in-kernel contraction for the fused kernel: None = auto (prefer the
# native "s8" int8 dot when qualified, else the chunked-"bf16c" form
# when that qualified); "s8"/"bf16c" force one (tests, HODOR_NTT_FUSED_IMPL)
_FUSED_IMPL = None


def _fused_dot_impl() -> str | None:
    """Which in-kernel dot the fused kernel should use, or None when
    neither variant is available (qualification manifest gating)."""
    import os

    from ..field.limbs import _pallas_enabled as _pe

    if _FUSED_IMPL is not None:
        return _FUSED_IMPL
    env = os.environ.get("HODOR_NTT_FUSED_IMPL")
    if env in ("s8", "bf16c"):
        return env
    if _pe("dft_reduce"):
        return "s8"
    if _pe("dft_reduce_bf16"):
        return "bf16c"
    return None


def _dft_matmul_fused(ops: LimbOps, x, size: int, inverse: bool, tw, interpret: bool,
                      dot_impl: str = "s8"):
    """DFT + wide Montgomery reduce as ONE Pallas kernel: the s8 MXU dot
    runs inside the kernel, so the (4n-1, S, M) int32 column intermediate
    (252 B/element, ~4x the data) never round-trips HBM. Bit-exact with
    the two-step path (tests/test_pallas.py)."""
    from ..field.pallas_kernels import LANES, pallas_dft_reduce

    field = ops.field
    L = ops.n16
    P = 2 * L
    SP = size * P
    C = 2 * P - 1
    lead = x.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    w_s8_np, w_sum_np, _ = _dft_matrix_folded_s8(field, size, inverse)
    w_s8 = jnp.asarray(np.ascontiguousarray(w_s8_np.reshape(C, size, SP)))
    w_sum_b = jnp.broadcast_to(
        jnp.asarray(w_sum_np)[:, :, None], (C, size, LANES)
    ).astype(jnp.int32)

    lo = (x & jnp.uint32(0xFF)).astype(jnp.int32)
    hi = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
    xb = jnp.stack([lo, hi], axis=-1).reshape(x.shape[:-1] + (P,))  # (..., S, P)
    xb = jnp.moveaxis(xb.reshape((m, size, P)), 1, 0)  # (S, M, P)
    # (m_tiles, SP, LANES): contraction index (j, q) = S*P rows per tile,
    # m_tiles leading so the Pallas block (1, SP, LANES) is always legal
    x_s8 = jnp.transpose(
        (jnp.swapaxes(xb, 1, 2).reshape(SP, m) - 128)
        .astype(jnp.int8)
        .reshape(SP, m // LANES, LANES),
        (1, 0, 2),
    )

    tw4 = None
    if tw is not None:
        if tw.ndim == 1:
            # scalar scale (e.g. the iNTT's 1/N): ONE (LANES, S, L) tile,
            # wrapped by the kernel's i % tw_tiles index map — the full
            # (m, S, L) broadcast (1 GiB at 2^24) never exists in HBM
            twf = jnp.broadcast_to(tw, (1, LANES, size, L))
        else:
            twf = jnp.broadcast_to(tw, lead + (size, L)).reshape(
                m // LANES, LANES, size, L
            )
        tw4 = jnp.transpose(twf, (0, 3, 2, 1))  # (tw_tiles, L, S, LANES)

    chain = tuple(
        tuple(int(v) for v in mult) for mult in _reduction_chain(field, size)
    )
    out = pallas_dft_reduce(
        field, w_s8, w_sum_b, x_s8, chain, tw4, dot_impl=dot_impl,
        interpret=interpret
    )  # (m_tiles, L, S, LANES)
    o = jnp.transpose(out, (2, 0, 3, 1)).reshape(size, m, L)  # (S, M, L)
    return jnp.moveaxis(o, 0, 1).reshape(lead + (size, L))


def _dft_matmul_fused_v2(ops: LimbOps, x, size: int, inverse: bool, tw,
                         interpret: bool):
    """v2 NTT level (pallas_ntt_level): u32 limb-major tiles in and out
    (in-kernel byte encode; 1 MB VMEM-resident plane-W; plane-dot ring
    accumulation — see field/pallas_kernels.py). The host graph around
    the kernel is ONE transpose on each side, which XLA fuses with the
    four-step swapaxes of the surrounding levels."""
    from ..field.pallas_kernels import LANES, pallas_ntt_level

    field = ops.field
    L = ops.n16
    lead = x.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    m_tiles = m // LANES
    dot_impl = _v2_dot_impl()
    w2 = jnp.asarray(_dft_matrix_planes_v2(field, size, inverse, dot_impl))

    x4 = jnp.transpose(
        x.reshape(m_tiles, LANES, size, L), (0, 3, 2, 1)
    )  # (m_tiles, L, S, LANES)
    tw4 = None
    if tw is not None:
        # the level twiddle depends only on the trailing batch axes it
        # was built over (n2 for the four-step level), so its pattern
        # repeats every prod(tw.shape[:-2]) elements of the flattened
        # batch; when that period is a whole number of lane tiles, pass
        # only one period and let the kernel's BlockSpec index map wrap
        # (i % tw_tiles) — the broadcast over the outer batch is never
        # materialized in HBM.
        t_lead = tw.shape[:-2]
        t_m = int(np.prod(t_lead)) if t_lead else 1
        if tw.ndim == 1:
            # scalar scale (iNTT 1/N): one lane tile, kernel wraps via
            # i % tw_tiles == 0 (ADVICE r04: the materialize branch
            # below would broadcast the scalar to the FULL batch in HBM)
            twf = jnp.broadcast_to(tw, (1, LANES, size, L))
        elif (
            t_m % LANES == 0
            and m % t_m == 0
            and tuple(lead[len(lead) - len(t_lead):]) == tuple(t_lead)
        ):
            twf = tw.reshape(t_m // LANES, LANES, size, L)
        else:
            twf = jnp.broadcast_to(tw, lead + (size, L)).reshape(
                m_tiles, LANES, size, L
            )
        tw4 = jnp.transpose(twf, (0, 3, 2, 1))

    chain = tuple(
        tuple(int(v) for v in mult) for mult in _reduction_chain(field, size)
    )
    out = pallas_ntt_level(
        field, w2, x4, chain, tw4, dot_impl=dot_impl, interpret=interpret
    )  # (m_tiles, L, S, LANES)
    return jnp.transpose(out, (0, 3, 2, 1)).reshape(lead + (size, L))


def _dft_matmul(ops: LimbOps, x, size: int, inverse: bool, tw=None):
    """Batched size-point DFT over axis -2 via ONE fused s8 MXU matmul.

    The plane convolution is folded into the W operand
    (_dft_matrix_folded_s8), so the contraction runs over (j, plane) at
    once - depth size*P - and no (S*P, M*P) intermediate ever hits HBM.
    Both operands are offset by -128 into int8 for the native MXU int8
    path; the exact integer result is recovered with rank-1 corrections:

      sum wb*xb = C_s8 + 128*Sx[m] + 128*Wsum[c,k] - 128^2 * S * P

    The Montgomery wide-reduction of the result columns - and the
    optional elementwise twiddle multiply `tw` (same shape as the
    output; applied after the DFT) - run in ONE fused Pallas kernel on
    TPU (field/pallas_kernels.pallas_wide_reduce); off-TPU they use the
    jnp path.

    x: (..., size, L) Montgomery -> (..., size, L) Montgomery.
    """
    field = ops.field
    L = ops.n16
    P = 2 * L
    lead = x.shape[:-2]
    m = int(np.prod(lead)) if lead else 1

    import os

    from ..field.limbs import _pallas_enabled as _pe
    from ..field.pallas_kernels import LANES as _LANES

    fused_impl = _fused_dot_impl()
    # DEFAULT-ON once qualified (VERDICT r03 item 2): the fused kernel is
    # the measured-fastest NTT level (5.74 ms vs 7.51 ms at 2^16,
    # tpu_run2.log:485), so when the qualification manifest marks it good
    # it engages without env plumbing; HODOR_NTT_FUSED=0 is the
    # kill-switch. The no-twiddle variant (only reachable when the whole
    # transform is exactly 128 points) is gated by its own diagnostic
    # manifest entry because its Mosaic compile fails where the deployed
    # with-twiddle shape compiles fine.
    # v2 level kernel first: strictly less HBM traffic (resident 1 MB W,
    # in-kernel encode, u32-native layout) and half the MXU work of v1.
    # HODOR_NTT_V2=0 is the kill-switch; the qualification manifest
    # ("ntt_level") gates it on real hardware like every other kernel.
    use_v2 = _FORCE_V2 in ("interpret", "on") or (
        _FORCE_V2 is None
        and os.environ.get("HODOR_NTT_V2", "1") != "0"
        and _pe("ntt_level")
    )
    if use_v2 and size == 128 and m % _LANES == 0 and m >= _LANES:
        return _dft_matmul_fused_v2(
            ops, x, size, inverse, tw, interpret=_FORCE_V2 == "interpret"
        )

    use_fused = _FORCE_FUSED == "interpret" or (
        _FORCE_FUSED is None
        and os.environ.get("HODOR_NTT_FUSED", "1") != "0"
        and fused_impl is not None
        and (tw is not None or _pe("dft_reduce_notw"))
    )
    if use_fused and size == 128 and m % _LANES == 0 and m >= _LANES:
        return _dft_matmul_fused(
            ops, x, size, inverse, tw, interpret=_FORCE_FUSED == "interpret",
            dot_impl=fused_impl or "s8",
        )

    w_s8, w_sum, _cnt = _dft_matrix_folded_s8(field, size, inverse)
    w_s8 = jnp.asarray(w_s8)  # (C, S, S, P) int8
    w_sum = jnp.asarray(w_sum)  # (C, S) int32
    C = 2 * P - 1

    # bytes of x as int8 (offset by -128), shaped (S_j, M, P)
    lo = (x & jnp.uint32(0xFF)).astype(jnp.int32)
    hi = ((x >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
    xb = jnp.stack([lo, hi], axis=-1).reshape(x.shape[:-1] + (P,))  # (..., S, P)
    xb = jnp.moveaxis(xb.reshape((m, size, P)), 1, 0)  # (S, M, P)
    x_s8 = (xb - 128).astype(jnp.int8)
    sx = jnp.sum(xb, axis=(0, 2), dtype=jnp.int32)  # (M,)

    c_s8 = jax.lax.dot_general(
        w_s8, x_s8, (((2, 3), (0, 2)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (C, S, M) int32
    cols = (
        c_s8
        + 128 * sx[None, None, :]
        + 128 * w_sum[:, :, None]
        - (128 * 128) * size * P
    ).astype(jnp.uint32)  # (C, S, M)

    total = size * m
    from ..field.limbs import _pallas_enabled
    from ..field.pallas_kernels import LANES, pallas_wide_reduce, wide_reduce_ok

    use_pallas = _FORCE_PALLAS == "interpret" or (
        _FORCE_PALLAS is None and _pallas_enabled("wide_reduce")
    )
    if use_pallas and wide_reduce_ok(total):
        chain = tuple(
            tuple(int(v) for v in mult) for mult in _reduction_chain(field, size)
        )
        cols3 = cols.reshape(C, total // LANES, LANES)
        tw3 = None
        scale_1d = tw is not None and tw.ndim == 1
        if tw is not None and not scale_1d:
            # align tw to the kernel's (k*M + m) element order, limb-major
            twf = jnp.moveaxis(
                jnp.broadcast_to(tw, lead + (size, L)).reshape(m, size, L), 1, 0
            ).reshape(total, L)
            tw3 = jnp.moveaxis(twf, 1, 0).reshape(L, total // LANES, LANES)
        out3 = pallas_wide_reduce(
            field, cols3, chain, tw3, interpret=_FORCE_PALLAS == "interpret"
        )  # (L, total//128, 128)
        out = jnp.transpose(out3.reshape(L, size, m), (1, 2, 0))  # (S, M, L)
        out = jnp.moveaxis(out, 0, 1).reshape(lead + (size, L))
        if scale_1d:
            # ADVICE r04: do NOT fold a scalar scale through this path —
            # the fold would materialize its full-batch broadcast as a
            # kernel operand; a separate lazily-broadcast ops.mul is one
            # fused elementwise pass
            out = ops.mul(out, tw)
        return out

    cols = jnp.moveaxis(cols, 0, 2)  # (S, M, C)
    out = _mont_reduce_wide(ops, cols, size)  # (S, M, L)
    out = jnp.moveaxis(out, 0, 1).reshape(lead + (size, L))
    if tw is not None:
        out = ops.mul(out, tw)
    return out


def ntt_matmul(ops: LimbOps, x, inverse: bool = False, scale=None):
    """Natural-order NTT over axis -2 using radix-128 matmul levels.

    scale: optional (L,) Montgomery constant folded into the TERMINAL
    level's fused twiddle multiply (the iNTT's 1/N — one full read+write
    pass over the array saved vs a separate post-multiply)."""
    n = x.shape[-2]
    # intt() calls this directly (bypassing ntt()'s assert); a
    # non-power-of-two n would silently compute garbage via n2 = n // n1
    assert n & (n - 1) == 0, f"ntt_matmul needs a power-of-two length, got {n}"
    radix = min(RADIX, max_radix(ops.field))
    if n == 1:
        return x if scale is None else ops.mul(x, scale)
    if n <= radix:
        if scale is not None:
            return _dft_matmul(ops, x, n, inverse, tw=scale)
        return _dft_matmul(ops, x, n, inverse)
    n1 = radix
    n2 = n // n1
    L = x.shape[-1]
    lead = x.shape[:-2]
    # j = j1*n2 + j2
    a = x.reshape(lead + (n1, n2, L))
    # inner: DFT_{n1} over j1 (axis -3) -> indexed [k1, j2], with the
    # twiddle w^(k1*j2) fused into the DFT's Montgomery reduction kernel
    inner = jnp.swapaxes(a, -3, -2)  # (..., n2, n1, L)
    tw = _level_twiddles_traced(ops, n, n1, inverse)  # (n1, n2, L)
    inner = _dft_matmul(ops, inner, n1, inverse, tw=jnp.swapaxes(tw, 0, 1))
    inner = jnp.swapaxes(inner, -3, -2)  # (..., n1(k1), n2(j2), L)
    # outer: DFT_{n2} over j2 per k1 (recurse; k1 folds into the batch)
    outer = ntt_matmul(ops, inner, inverse, scale=scale)
    # natural order: out[k2*n1 + k1]
    out = jnp.swapaxes(outer, -3, -2)  # (..., n2(k2), n1(k1), L)
    return out.reshape(lead + (n, L))


def intt_matmul(ops: LimbOps, x):
    n = x.shape[-2]
    minv = ops.const(ops.field.inv(n % ops.field.p))
    return ntt_matmul(ops, x, inverse=True, scale=minv)
