"""Pallas TPU kernels for field arithmetic.

XLA splits the ~1300-op Montgomery-multiply graph into dozens of
fusions, each round-tripping HBM; the arithmetic itself is ~30x cheaper
than that traffic. These kernels run the ENTIRE limb computation over an
(8k, 128) element tile inside one Mosaic kernel - one HBM read, one
write - with every limb kept in vector registers/VMEM.

The kernels reproduce hodor_tpu.field.limbs.LimbOps.mul bit-exactly
(relaxed-carry Montgomery with two carry chains). Elementwise list-form
limb arithmetic vectorizes over the (rows, 128) tile.

KNOWN LIMITATION (round 1): the fully-unrolled 16-limb kernel is
bit-exact in interpret mode, but the axon remote Mosaic compile of the
~1300-op kernel exceeded 20 minutes and was never observed to finish;
the kernel is not yet wired into the default mul path. Round-2 plan:
restructure the schoolbook phases as in-kernel fori_loops over the limb
index to shrink the op count ~8x before Mosaic sees it.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import Field
from .limbs import int_to_limbs

MASK16 = 0xFFFF  # plain int: jnp constants can't be captured inside pallas kernels

ROWS = 32  # sublane-rows per block; 32*128 = 4096 elements per grid step
LANES = 128


def _mul_limbs_lists(xs, ys, n):
    """Schoolbook column sums, list form; xs/ys: n arrays (R, 128)."""
    acc = [None] * (2 * n)

    def add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(n):
        for j in range(n):
            p = xs[i] * ys[j]
            add(i + j, p & MASK16)
            if i + j + 1 < 2 * n:
                add(i + j + 1, p >> 16)
    return acc


def _carry_list(cols, n_out):
    outs = []
    carry = None
    for k in range(n_out):
        t = cols[k] if k < len(cols) and cols[k] is not None else None
        if t is None:
            t = carry
            carry = None
        elif carry is not None:
            t = t + carry
        outs.append(t & MASK16)
        carry = t >> 16
    return outs


def _mont_mul_block(xs, ys, p_list, pinv_list, n):
    """Full Montgomery multiply on lists of (R, 128) limb planes.
    Mirrors LimbOps.mul (relaxed carries, two chains)."""
    t_cols = _mul_limbs_lists(xs, ys, n)
    # m = (t mod R) * p' mod R, truncated conv with lo/hi split
    m_acc = [None] * n

    def madd(k, v):
        if k < n:
            m_acc[k] = v if m_acc[k] is None else m_acc[k] + v

    for i in range(n):
        lo16 = t_cols[i] & MASK16
        hi6 = t_cols[i] >> 16
        for j in range(n - i):
            pr = lo16 * pinv_list[j]
            madd(i + j, pr & MASK16)
            madd(i + j + 1, pr >> 16)
            madd(i + j + 1, hi6 * pinv_list[j])
    m = _carry_list(m_acc, n)
    # u = (t + m*p) / R
    mp_cols = _mul_limbs_lists(m, list(p_list), n)  # ints: weak-typed muls
    u_cols = [
        (t_cols[k] if t_cols[k] is not None else 0)
        + (mp_cols[k] if mp_cols[k] is not None else 0)
        for k in range(2 * n)
    ]
    u = _carry_list(u_cols, 2 * n)[n:]
    # conditional subtract p
    borrow = None
    diff = []
    for k in range(n):
        t = u[k] + 0x10000 - p_list[k] - (borrow if borrow is not None else 0)
        diff.append(t & MASK16)
        borrow = 1 - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, diff[k], u[k]) for k in range(n)]


def _mont_mul_kernel(n, p_list, pinv_list, a_ref, b_ref, o_ref):
    xs = [a_ref[:, :, k] for k in range(n)]
    ys = [b_ref[:, :, k] for k in range(n)]
    out = _mont_mul_block(xs, ys, p_list, pinv_list, n)
    o_ref[:, :, :] = jnp.stack(out, axis=-1)


@lru_cache(maxsize=None)
def _mul_call(field: Field, rows: int, interpret: bool):
    n = field.n16
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_mont_mul_kernel, n, p_list, pinv_list)

    def call(a3, b3):
        m = a3.shape[0]
        grid = (m // rows,)
        spec = pl.BlockSpec((rows, LANES, n), lambda i: (i, 0, 0))
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(a3, b3)

    return call


def pallas_mont_mul(field: Field, a, b, interpret: bool = False):
    """Elementwise Montgomery multiply via one fused Pallas kernel.

    a, b: (..., n16) uint32 Montgomery limb arrays with identical shapes
    whose element count is a multiple of ROWS*128. Returns a*b*R^-1 mod p.
    """
    n = field.n16
    shape = a.shape
    total = int(np.prod(shape[:-1]))
    assert total % (ROWS * LANES) == 0, "element count must be a multiple of 4096"
    a3 = a.reshape(total // LANES, LANES, n)
    b3 = b.reshape(total // LANES, LANES, n)
    out = _mul_call(field, ROWS, interpret)(a3, b3)
    return out.reshape(shape)


def pallas_ok(shape, n16: int) -> bool:
    """True when pallas_mont_mul supports this operand shape."""
    if len(shape) < 2 or shape[-1] != n16:
        return False
    total = 1
    for s in shape[:-1]:
        total *= s
    return total % (ROWS * LANES) == 0 and total >= ROWS * LANES


# ---------------------------------------------------------------- v2:
# loop-structured kernel: phases run as in-kernel fori_loops so Mosaic
# sees ~200 ops instead of ~1300 (the unrolled kernel above compiles in
# interpret mode but exceeds the axon remote-compile budget).

def _mont_mul_kernel_v2(n, p_list, pinv_list, a_ref, b_ref, p_ref, pinv_ref, o_ref, acc_ref, macc_ref):
    """Blocks are LIMB-MAJOR: refs are (n, rows, LANES) so the fori_loop
    limb index lands on the leading dim (Mosaic cannot dynamically slice
    the lane dim)."""
    R, L = a_ref.shape[1], a_ref.shape[2]
    zeros_block = jnp.zeros((R, L), jnp.uint32)

    b_list = b_ref[:]  # (n, R, L)
    acc_ref[...] = jnp.zeros((2 * n + 1, R, L), jnp.uint32)
    macc_ref[...] = jnp.zeros((2 * n + 1, R, L), jnp.uint32)

    # phase 1: t columns; acc[i..i+n] += lo, acc[i+1..i+n+1] += hi
    def p1(i, _):
        xi = a_ref[i]
        prod = xi[None, :, :] * b_list
        lo = prod & MASK16
        hi = prod >> 16
        acc_ref[pl.ds(i, n)] += lo
        acc_ref[pl.ds(i + 1, n)] += hi
        return 0

    jax.lax.fori_loop(0, n, p1, 0)

    # phase 2: m = (t mod R)*p' mod R (truncated; rows >= n ignored)
    pinv_arr = pinv_ref[:]  # (n, 1, LANES)

    def p2(i, _):
        ti = acc_ref[i]
        lo16 = ti & MASK16
        hi6 = ti >> 16
        pr = lo16[None, :, :] * pinv_arr
        macc_ref[pl.ds(i, n)] += pr & MASK16
        macc_ref[pl.ds(i + 1, n)] += (pr >> 16) + hi6[None, :, :] * pinv_arr
        return 0

    jax.lax.fori_loop(0, n, p2, 0)

    # carry-normalize m (only the first n rows matter)
    def mchain(k, carry):
        t = macc_ref[k] + carry
        macc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, n, mchain, zeros_block)

    # phase 3: u = t + m*p accumulated into acc
    p_arr = p_ref[:]  # (n, 1, LANES)

    def p3(i, _):
        mi = macc_ref[i]
        pr = mi[None, :, :] * p_arr
        acc_ref[pl.ds(i, n)] += pr & MASK16
        acc_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p3, 0)

    # final carry over 2n columns; keep the high n limbs
    def uchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)

    # conditional subtract p (unrolled: n small ops)
    borrow = None
    diff = []
    for k in range(n):
        t = acc_ref[n + k] + 0x10000 - p_list[k] - (borrow if borrow is not None else 0)
        diff.append(t & MASK16)
        borrow = 1 - (t >> 16)
    ge = borrow == 0
    out = [jnp.where(ge, diff[k], acc_ref[n + k]) for k in range(n)]
    o_ref[...] = jnp.stack(out, axis=0)


@lru_cache(maxsize=None)
def _mul_call_v2(field: Field, rows: int, interpret: bool):
    n = field.n16
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_mont_mul_kernel_v2, n, p_list, pinv_list)
    p_arr = np.broadcast_to(
        np.asarray(p_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()
    pinv_arr = np.broadcast_to(
        np.asarray(pinv_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()

    def call(a3, b3):
        # a3, b3: (n, M, LANES) limb-major
        m = a3.shape[1]
        grid = (m // rows,)
        spec = pl.BlockSpec((n, rows, LANES), lambda i: (0, i, 0))
        cspec = pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, 0))
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
            grid=grid,
            in_specs=[spec, spec, cspec, cspec],
            out_specs=spec,
            scratch_shapes=[
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
            ],
            interpret=interpret,
        )(a3, b3, jnp.asarray(p_arr), jnp.asarray(pinv_arr))

    return call


def pallas_mont_mul_v2(field: Field, a, b, interpret: bool = False):
    """Loop-structured variant of pallas_mont_mul (same semantics).
    Transposes to limb-major around the kernel (cheap XLA transposes)."""
    n = field.n16
    shape = a.shape
    total = int(np.prod(shape[:-1]))
    assert total % (ROWS * LANES) == 0
    a3 = jnp.moveaxis(a.reshape(total, n), 1, 0).reshape(n, total // LANES, LANES)
    b3 = jnp.moveaxis(b.reshape(total, n), 1, 0).reshape(n, total // LANES, LANES)
    out = _mul_call_v2(field, ROWS, interpret)(a3, b3)
    out = jnp.moveaxis(out.reshape(n, total), 0, 1)
    return out.reshape(shape)


# ------------------------------------------------- wide reduce (+twiddle)
# The matmul NTT (ntt/matmul.py) produces, per output element, 4n-1
# base-256 "wide" columns of the exact integer sum_j W[k,j]*x[j]
# (< radix * p^2). The Montgomery reduction of those columns back to
# 16-bit-limb form - plus the level-twiddle Montgomery multiply that
# immediately follows it - is the elementwise arithmetic that dominated
# the round-1 profile (the s8 MXU dots are nearly free; XLA fragments
# the reduction into dozens of HBM-bound fusions). This kernel runs the
# whole fold -> carry -> m -> m*p -> carry -> cond-sub chain -> twiddle
# Montgomery-mul pipeline in one Mosaic kernel over (C, rows, 128)
# limb-major blocks, mirroring hodor_tpu.ntt.matmul._mont_reduce_wide
# bit-exactly.


def _cond_sub_ints(u, sub_list, n):
    """Conditionally subtract a constant limb tuple from limb-plane list
    u (only when u >= value)."""
    borrow = None
    diff = []
    for k in range(n):
        t = u[k] + 0x10000 - sub_list[k] - (borrow if borrow is not None else 0)
        diff.append(t & MASK16)
        borrow = 1 - (t >> 16)
    ge = borrow == 0
    return [jnp.where(ge, diff[k], u[k]) for k in range(n)]


def _wide_reduce_kernel(n, chain, p_list, pinv_list, has_tw, *refs):
    """Blocks are LIMB-MAJOR. cols_ref: (4n-1, R, L) uint32 base-256
    columns (< 2^31) of t < radix*p^2; optional tw_ref (n, R, L)
    Montgomery twiddles; o_ref (n, R, L) = t*R^-1 (* tw * R^-1) mod p."""
    if has_tw:
        cols_ref, tw_ref, p_ref, pinv_ref, o_ref, acc_ref, macc_ref = refs
    else:
        cols_ref, p_ref, pinv_ref, o_ref, acc_ref, macc_ref = refs
    C = cols_ref.shape[0]
    R, L = cols_ref.shape[1], cols_ref.shape[2]
    zeros_block = jnp.zeros((R, L), jnp.uint32)
    macc_ref[...] = jnp.zeros((2 * n + 1, R, L), jnp.uint32)

    # fold base-256 columns into 2n relaxed 16-bit columns
    # t = sum_i A_i*2^(16i) + 256*sum_i B_i*2^(16i), A/B = even/odd cols
    # limb_i = A_i + (B_i & 0xFF)<<8 + (B_{i-1} >> 8)  (< 2^29)
    for i in range(2 * n):
        val = cols_ref[2 * i]
        if 2 * i + 1 < C:
            val = val + ((cols_ref[2 * i + 1] & 0xFF) << 8)
        if i >= 1:
            val = val + (cols_ref[2 * i - 1] >> 8)
        acc_ref[i] = val
    acc_ref[2 * n] = zeros_block

    # carry-normalize t over 2n limbs
    def tchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, tchain, zeros_block)

    # m = (t mod R) * p' mod R (truncated conv; t limbs proper 16-bit)
    pinv_arr = pinv_ref[:]  # (n, 1, L)

    def p2(i, _):
        ti = acc_ref[i]
        pr = ti[None, :, :] * pinv_arr
        macc_ref[pl.ds(i, n)] += pr & MASK16
        macc_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p2, 0)

    def mchain(k, carry):
        t = macc_ref[k] + carry
        macc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, n, mchain, zeros_block)

    # u = (t + m*p) / R
    p_arr = p_ref[:]  # (n, 1, L)

    def p3(i, _):
        mi = macc_ref[i]
        pr = mi[None, :, :] * p_arr
        acc_ref[pl.ds(i, n)] += pr & MASK16
        acc_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p3, 0)

    def uchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)

    # bound-derived conditional-subtract chain brings u below p
    u = [acc_ref[n + k] for k in range(n)]
    for mult in chain:
        u = _cond_sub_ints(u, mult, n)

    if not has_tw:
        o_ref[...] = jnp.stack(u, axis=0)
        return

    # fused twiddle: full Montgomery multiply u * tw (v2 mul structure)
    o_ref[...] = jnp.stack(u, axis=0)
    acc_ref[...] = jnp.zeros((2 * n + 1, R, L), jnp.uint32)
    macc_ref[...] = jnp.zeros((2 * n + 1, R, L), jnp.uint32)
    tw_list = tw_ref[:]  # (n, R, L)

    def q1(i, _):
        xi = o_ref[i]
        prod = xi[None, :, :] * tw_list
        acc_ref[pl.ds(i, n)] += prod & MASK16
        acc_ref[pl.ds(i + 1, n)] += prod >> 16
        return 0

    jax.lax.fori_loop(0, n, q1, 0)

    def q2(i, _):
        ti = acc_ref[i]
        lo16 = ti & MASK16
        hi6 = ti >> 16
        pr = lo16[None, :, :] * pinv_arr
        macc_ref[pl.ds(i, n)] += pr & MASK16
        macc_ref[pl.ds(i + 1, n)] += (pr >> 16) + hi6[None, :, :] * pinv_arr
        return 0

    jax.lax.fori_loop(0, n, q2, 0)
    jax.lax.fori_loop(0, n, mchain, zeros_block)
    jax.lax.fori_loop(0, n, p3, 0)
    jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)
    u = [acc_ref[n + k] for k in range(n)]
    u = _cond_sub_ints(u, p_list, n)
    o_ref[...] = jnp.stack(u, axis=0)


@lru_cache(maxsize=None)
def _wide_reduce_call(field: Field, chain, rows: int, has_tw: bool, interpret: bool):
    n = field.n16
    C = 4 * n - 1
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_wide_reduce_kernel, n, chain, p_list, pinv_list, has_tw)
    p_arr = np.broadcast_to(
        np.asarray(p_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()
    pinv_arr = np.broadcast_to(
        np.asarray(pinv_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()

    def call(cols3, tw3):
        m = cols3.shape[1]
        grid = (m // rows,)
        cspec = pl.BlockSpec((C, rows, LANES), lambda i: (0, i, 0))
        lspec = pl.BlockSpec((n, rows, LANES), lambda i: (0, i, 0))
        const_spec = pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, 0))
        in_specs = [cspec] + ([lspec] if has_tw else []) + [const_spec, const_spec]
        args = [cols3] + ([tw3] if has_tw else []) + [jnp.asarray(p_arr), jnp.asarray(pinv_arr)]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n,) + cols3.shape[1:], jnp.uint32),
            grid=grid,
            in_specs=in_specs,
            out_specs=lspec,
            scratch_shapes=[
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
            ],
            interpret=interpret,
        )(*args)

    return call


def pallas_wide_reduce(field: Field, cols3, chain, tw3=None, interpret: bool = False):
    """Fused Montgomery wide-reduction (+ optional twiddle multiply).

    cols3: (4*n16-1, M, 128) uint32 base-256 columns of integers
    t < radix*p^2 (M a multiple of ROWS); chain: tuple of limb tuples
    (multiples of p) from ntt.matmul._reduction_chain; tw3: optional
    (n16, M, 128) Montgomery twiddles. Returns (n16, M, 128) Montgomery
    limbs of t*R^-1 (*tw*R^-1) mod p."""
    return _wide_reduce_call(field, chain, ROWS, tw3 is not None, interpret)(cols3, tw3)


def wide_reduce_ok(total: int) -> bool:
    """True when the element count supports the wide-reduce kernel."""
    return total % (ROWS * LANES) == 0 and total >= ROWS * LANES


# ----------------------------------------------------------- FRI fold
# One FRI fold round (fri/fri.py _fold_round_body) is algebraically
#   out = ((lo + hi) + (lo - hi) * w * c) / 2
# which the jnp path runs as 5 separate kernels (add, sub, 3 muls),
# each round-tripping HBM. This kernel computes the equivalent
#   out = mont(mont(lo - hi, w), c/2) + mont(lo + hi, 1/2)
# in ONE pass (identical canonical limbs: Montgomery ops are exact mod p
# and every intermediate is reduced below p). The three Montgomery
# multiplies reuse the v2 kernel's fori_loop phase structure so the
# Mosaic op count stays ~600, well under the ~1300 that broke the
# remote compile budget for the fully unrolled v1 kernel.


def _mont_mul_phases(n, a_ref, b_arr, o_ref, acc_ref, macc_ref, p_arr, pinv_arr, zeros_block):
    """In-kernel Montgomery multiply o = a * b * R^-1 mod p.
    a_ref: (n, R, L) ref (dynamically indexable); b_arr: (n, R, L) or
    (n, 1, L) array value; o_ref: (n, R, L) ref; acc/macc: (2n+1, R, L)
    scratch refs; p/pinv: (n, 1, L) arrays."""
    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.uint32)
    macc_ref[...] = jnp.zeros(macc_ref.shape, jnp.uint32)

    def p1(i, _):
        xi = a_ref[i]
        prod = xi[None, :, :] * b_arr
        acc_ref[pl.ds(i, n)] += prod & MASK16
        acc_ref[pl.ds(i + 1, n)] += prod >> 16
        return 0

    jax.lax.fori_loop(0, n, p1, 0)

    def p2(i, _):
        ti = acc_ref[i]
        lo16 = ti & MASK16
        hi6 = ti >> 16
        pr = lo16[None, :, :] * pinv_arr
        macc_ref[pl.ds(i, n)] += pr & MASK16
        macc_ref[pl.ds(i + 1, n)] += (pr >> 16) + hi6[None, :, :] * pinv_arr
        return 0

    jax.lax.fori_loop(0, n, p2, 0)

    def mchain(k, carry):
        t = macc_ref[k] + carry
        macc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, n, mchain, zeros_block)

    def p3(i, _):
        mi = macc_ref[i]
        pr = mi[None, :, :] * p_arr
        acc_ref[pl.ds(i, n)] += pr & MASK16
        acc_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p3, 0)

    def uchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)

    u = [acc_ref[n + k] for k in range(n)]
    borrow = None
    diff = []
    p_list = [p_arr[k, 0] for k in range(n)]
    for k in range(n):
        t = u[k] + 0x10000 - p_list[k] - (borrow if borrow is not None else 0)
        diff.append(t & MASK16)
        borrow = 1 - (t >> 16)
    ge = borrow == 0
    o_ref[...] = jnp.stack(
        [jnp.where(ge, diff[k], u[k]) for k in range(n)], axis=0
    )


def _fri_fold_kernel(n, lo_ref, hi_ref, w_ref, cs_ref, inv2_ref, p_ref, pinv_ref,
                     o_ref, s_ref, t_ref, acc_ref, macc_ref):
    """lo/hi/w: (n, R, L); cs (challenge*inv2) / inv2 / p / pinv:
    (n, 1, L); out (n, R, L) = mont(mont(lo-hi, w), cs) + mont(lo+hi, inv2)."""
    R, L = lo_ref.shape[1], lo_ref.shape[2]
    zeros_block = jnp.zeros((R, L), jnp.uint32)
    p_arr = p_ref[:]
    pinv_arr = pinv_ref[:]
    p_list = [p_arr[k, 0] for k in range(n)]

    def mod_addsub(a_planes, b_planes, mode):
        if mode == "add":
            carry = None
            s = []
            for k in range(n):
                t = a_planes[k] + b_planes[k] + (carry if carry is not None else 0)
                s.append(t & MASK16)
                carry = t >> 16
            borrow = None
            diff = []
            for k in range(n):
                t = s[k] + 0x10000 - p_list[k] - (borrow if borrow is not None else 0)
                diff.append(t & MASK16)
                borrow = 1 - (t >> 16)
            ge = (borrow == 0) | (carry > 0)
            return [jnp.where(ge, diff[k], s[k]) for k in range(n)]
        borrow = None
        d = []
        for k in range(n):
            t = a_planes[k] + 0x10000 - b_planes[k] - (borrow if borrow is not None else 0)
            d.append(t & MASK16)
            borrow = 1 - (t >> 16)
        carry = None
        fixed = []
        for k in range(n):
            t = d[k] + p_list[k] + (carry if carry is not None else 0)
            fixed.append(t & MASK16)
            carry = t >> 16
        neg = borrow == 1
        return [jnp.where(neg, fixed[k], d[k]) for k in range(n)]

    lo_p = [lo_ref[k] for k in range(n)]
    hi_p = [hi_ref[k] for k in range(n)]
    # s = lo - hi; t = mont(s, w); t = mont(t, c*inv2)
    s_ref[...] = jnp.stack(mod_addsub(lo_p, hi_p, "sub"), axis=0)
    _mont_mul_phases(n, s_ref, w_ref[:], t_ref, acc_ref, macc_ref, p_arr, pinv_arr, zeros_block)
    _mont_mul_phases(n, t_ref, cs_ref[:], s_ref, acc_ref, macc_ref, p_arr, pinv_arr, zeros_block)
    # d = lo + hi; d = mont(d, inv2)
    o_ref[...] = jnp.stack(mod_addsub(lo_p, hi_p, "add"), axis=0)
    _mont_mul_phases(n, o_ref, inv2_ref[:], t_ref, acc_ref, macc_ref, p_arr, pinv_arr, zeros_block)
    # out = s + t
    s_p = [s_ref[k] for k in range(n)]
    t_p = [t_ref[k] for k in range(n)]
    o_ref[...] = jnp.stack(mod_addsub(s_p, t_p, "add"), axis=0)


@lru_cache(maxsize=None)
def _fri_fold_call(field: Field, rows: int, interpret: bool):
    n = field.n16
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_fri_fold_kernel, n)
    p_arr = np.broadcast_to(
        np.asarray(p_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()
    pinv_arr = np.broadcast_to(
        np.asarray(pinv_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()

    def call(lo3, hi3, w3, cs3, inv23):
        m = lo3.shape[1]
        grid = (m // rows,)
        spec = pl.BlockSpec((n, rows, LANES), lambda i: (0, i, 0))
        cspec = pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, 0))
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(lo3.shape, jnp.uint32),
            grid=grid,
            in_specs=[spec, spec, spec, cspec, cspec, cspec, cspec],
            out_specs=spec,
            scratch_shapes=[
                pltpu.VMEM((n, rows, LANES), jnp.uint32),
                pltpu.VMEM((n, rows, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, rows, LANES), jnp.uint32),
            ],
            interpret=interpret,
        )(lo3, hi3, w3, cs3, inv23, jnp.asarray(p_arr), jnp.asarray(pinv_arr))

    return call


def pallas_fri_fold(field: Field, lo, hi, w, c_scaled, inv2, interpret: bool = False):
    """Fused FRI fold: ((lo+hi) + (lo-hi)*w*c)/2 with c_scaled = c/2 and
    inv2 = 1/2 (both (L,) Montgomery scalars). lo/hi/w: (half, L)
    Montgomery arrays, half*... a multiple of ROWS*LANES."""
    n = field.n16
    shape = lo.shape
    total = int(np.prod(shape[:-1]))
    assert total % (ROWS * LANES) == 0

    def to3(x):
        return jnp.moveaxis(x.reshape(total, n), 1, 0).reshape(n, total // LANES, LANES)

    def bc(x):
        return jnp.broadcast_to(x.reshape(n, 1, 1), (n, 1, LANES))

    out = _fri_fold_call(field, ROWS, interpret)(
        to3(lo), to3(hi), to3(w), bc(c_scaled), bc(inv2)
    )
    return jnp.moveaxis(out.reshape(n, total), 0, 1).reshape(shape)


# ----------------------------------------------------------- blake2s
# The jnp compress (merkle/blake2s.py) runs its 10-round fori_loop as 10
# XLA loop iterations whose 16-word state round-trips HBM each round
# (~2KB of traffic per hash). This kernel keeps the whole state in
# vector registers: one HBM read of the message block, one write of the
# digest. SIGMA lives in SMEM so the in-kernel round loop stays ~130
# Mosaic ops (the fully unrolled form is ~1300 - the size that broke
# the remote Mosaic compile budget for the v1 mul kernel).

_B2S_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)


def _blake2s_kernel(mid, t_total, m_ref, sigma_ref, o_ref):
    """m_ref (16, R, L) u32 message words; sigma_ref (10, 16) int32 in
    SMEM; o_ref (8, R, L) digests. mid: post-key midstate (8 ints);
    t_total: final byte counter (always < 2^32 here; final=True)."""
    R, L = m_ref.shape[1], m_ref.shape[2]

    def mk(c):
        return jnp.full((R, L), c, jnp.uint32)

    def rotr(x, r):
        return (x >> r) | (x << (32 - r))

    v_init = [mk(mid[i]) for i in range(8)] + [mk(_B2S_IV[i]) for i in range(8)]
    v_init[12] = v_init[12] ^ jnp.uint32(t_total & 0xFFFFFFFF)
    v_init[14] = v_init[14] ^ jnp.uint32(0xFFFFFFFF)  # final block flag

    def round_body(r, v):
        v = list(v)
        mm = [m_ref[sigma_ref[r, i]] for i in range(16)]

        def g(a, b, c, d, x, y):
            v[a] = v[a] + v[b] + x
            v[d] = rotr(v[d] ^ v[a], 16)
            v[c] = v[c] + v[d]
            v[b] = rotr(v[b] ^ v[c], 12)
            v[a] = v[a] + v[b] + y
            v[d] = rotr(v[d] ^ v[a], 8)
            v[c] = v[c] + v[d]
            v[b] = rotr(v[b] ^ v[c], 7)

        g(0, 4, 8, 12, mm[0], mm[1])
        g(1, 5, 9, 13, mm[2], mm[3])
        g(2, 6, 10, 14, mm[4], mm[5])
        g(3, 7, 11, 15, mm[6], mm[7])
        g(0, 5, 10, 15, mm[8], mm[9])
        g(1, 6, 11, 12, mm[10], mm[11])
        g(2, 7, 8, 13, mm[12], mm[13])
        g(3, 4, 9, 14, mm[14], mm[15])
        return tuple(v)

    v = jax.lax.fori_loop(0, 10, round_body, tuple(v_init))
    out = [jnp.uint32(mid[i]) ^ v[i] ^ v[i + 8] for i in range(8)]
    o_ref[...] = jnp.stack(out, axis=0)


@lru_cache(maxsize=None)
def _blake2s_call(mid: tuple, t_total: int, rows: int, interpret: bool):
    kern = partial(_blake2s_kernel, mid, t_total)
    sigma = np.array(
        [
            [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
            [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
            [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
            [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
            [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
            [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
            [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
            [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
            [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
            [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
        ],
        dtype=np.int32,
    )

    def call(m3):
        # m3: (16, M, LANES) u32
        m = m3.shape[1]
        grid = (m // rows,)
        mspec = pl.BlockSpec((16, rows, LANES), lambda i: (0, i, 0))
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        ospec = pl.BlockSpec((8, rows, LANES), lambda i: (0, i, 0))
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8,) + m3.shape[1:], jnp.uint32),
            grid=grid,
            in_specs=[mspec, sspec],
            out_specs=ospec,
            interpret=interpret,
        )(m3, jnp.asarray(sigma))

    return call


# above this many hashes per call the limb-major transpose + digests are
# built in lax.map chunks: at 2^24 leaves the (16, M, 128) message
# transpose alone is a 1 GiB temp per oracle — chunking caps the
# per-step footprint at ~128 MiB while the output concat is the data
_HASH_CHUNK = 1 << 21


def pallas_blake2s(m_words, message_bytes: int, mid: tuple, interpret: bool = False):
    """Keyed-midstate Blake2s of (..., 16)-word single blocks via one
    fused kernel. m_words: (..., 16) uint32; total element count must be
    a multiple of ROWS*LANES. Returns (..., 8) uint32 digests."""
    shape = m_words.shape
    total = int(np.prod(shape[:-1]))
    assert total % (ROWS * LANES) == 0
    call = _blake2s_call(mid, 64 + message_bytes, ROWS, interpret)

    def _hash_flat(mw):
        n = mw.shape[0]
        m3 = jnp.moveaxis(mw, 1, 0).reshape(16, n // LANES, LANES)
        out = call(m3)
        return jnp.moveaxis(out.reshape(8, n), 0, 1)

    flat = m_words.reshape(total, 16)
    if (
        total > _HASH_CHUNK
        and total % _HASH_CHUNK == 0
        and _HASH_CHUNK % (ROWS * LANES) == 0
    ):
        out = jax.lax.map(
            _hash_flat, flat.reshape(total // _HASH_CHUNK, _HASH_CHUNK, 16)
        ).reshape(total, 8)
    else:
        out = _hash_flat(flat)
    return out.reshape(shape[:-1] + (8,))


# ------------------------------------------------------- add / sub / neg

def _addsub_kernel(n, p_list, mode, a_ref, b_ref, o_ref):
    """Fused modular add/sub on limb-major (n, rows, LANES) blocks."""
    if mode == "add":
        # s = a + b with carries, then conditional -p
        carry = None
        s = []
        for k in range(n):
            t = a_ref[k] + b_ref[k] + (carry if carry is not None else 0)
            s.append(t & MASK16)
            carry = t >> 16
        borrow = None
        diff = []
        for k in range(n):
            t = s[k] + 0x10000 - p_list[k] - (borrow if borrow is not None else 0)
            diff.append(t & MASK16)
            borrow = 1 - (t >> 16)
        # value >= p when no borrow OR the add carried out of the top limb
        ge = (borrow == 0) | (carry > 0)
        out = [jnp.where(ge, diff[k], s[k]) for k in range(n)]
    else:
        # d = a - b; if borrow, add p back
        borrow = None
        d = []
        for k in range(n):
            t = a_ref[k] + 0x10000 - b_ref[k] - (borrow if borrow is not None else 0)
            d.append(t & MASK16)
            borrow = 1 - (t >> 16)
        carry = None
        fixed = []
        for k in range(n):
            t = d[k] + p_list[k] + (carry if carry is not None else 0)
            fixed.append(t & MASK16)
            carry = t >> 16
        neg = borrow == 1
        out = [jnp.where(neg, fixed[k], d[k]) for k in range(n)]
    o_ref[...] = jnp.stack(out, axis=0)


@lru_cache(maxsize=None)
def _addsub_call(field: Field, rows: int, mode: str, interpret: bool):
    n = field.n16
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    kern = partial(_addsub_kernel, n, p_list, mode)

    def call(a3, b3):
        m = a3.shape[1]
        grid = (m // rows,)
        spec = pl.BlockSpec((n, rows, LANES), lambda i: (0, i, 0))
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(a3, b3)

    return call


def pallas_addsub(field: Field, a, b, mode: str, interpret: bool = False):
    """Fused modular add ('add') or sub ('sub'). Shapes as pallas_mont_mul."""
    n = field.n16
    shape = a.shape
    total = int(np.prod(shape[:-1]))
    assert total % (ROWS * LANES) == 0
    a3 = jnp.moveaxis(a.reshape(total, n), 1, 0).reshape(n, total // LANES, LANES)
    b3 = jnp.moveaxis(b.reshape(total, n), 1, 0).reshape(n, total // LANES, LANES)
    out = _addsub_call(field, ROWS, mode, interpret)(a3, b3)
    return jnp.moveaxis(out.reshape(n, total), 0, 1).reshape(shape)


# ------------------------------------------- fused DFT-128 + wide reduce
# EXPERIMENTAL (round-2 prep for round 3, gated by HODOR_NTT_FUSED):
# the radix-128 DFT matmul currently runs as an XLA s8 dot whose
# (4n-1, S, M) int32 column output round-trips HBM (252 B/element -
# ~4x the data itself) before pallas_wide_reduce consumes it. This
# kernel runs the dot ON THE MXU INSIDE the same Mosaic kernel that
# reduces the columns: grid (m_tiles, C) with the C axis innermost, the
# x tile resident in VMEM across all C steps, one 512 KB w-plane slice
# streamed per step, base-256 columns folded incrementally into the
# relaxed-limb accumulator, and the Montgomery reduction (+ optional
# fused twiddle multiply) as the epilogue of the last step. The columns
# never touch HBM.


def _dft_reduce_kernel(n, chain, p_list, sp, c_count, has_tw, dot_impl, *refs):
    if has_tw:
        (w_ref, wsum_ref, x_ref, tw_ref, p_ref, pinv_ref, o_ref,
         acc_ref, macc_ref, sx_ref) = refs
    else:
        (w_ref, wsum_ref, x_ref, p_ref, pinv_ref, o_ref,
         acc_ref, macc_ref, sx_ref) = refs
    c = pl.program_id(1)
    S = acc_ref.shape[1]
    zeros_block = jnp.zeros((S, LANES), jnp.uint32)

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.uint32)
        xi = x_ref[0].astype(jnp.int32)  # (SP, LANES)
        # sx[m] = sum_j,q xb = sum x_s8 + 128*SP (broadcast row)
        sx_ref[...] = jnp.broadcast_to(
            jnp.sum(xi, axis=0)[None, :] + 128 * sp, sx_ref.shape
        )

    # one (S, SP) @ (SP, LANES) dot on the MXU -> int32 columns
    if dot_impl == "s8":
        d = jax.lax.dot_general(
            w_ref[0], x_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (S, LANES)
    else:
        # "bf16c": fallback for Mosaic builds that reject the in-kernel
        # int8 matmul — run the contraction as chunked bf16 MXU dots.
        # Exact by construction: s8 values are integers <= 128 (exact in
        # bf16), each product is exact in the f32 accumulator, and a
        # 512-term chunk sums to <= 512*2^14 = 2^23 < 2^24, inside f32's
        # exact-integer range. Chunk results convert to int32 and
        # accumulate on the VPU.
        ch = min(512, sp)
        d = jnp.zeros((S, LANES), jnp.int32)
        for k0 in range(0, sp, ch):
            wf = w_ref[0, :, k0:k0 + ch].astype(jnp.bfloat16)
            xf = x_ref[0, k0:k0 + ch, :].astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                wf, xf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = d + part.astype(jnp.int32)
    col = (
        d + sx_ref[0, :][None, :] * 128 + wsum_ref[0] * 128
        - (128 * 128) * sp
    ).astype(jnp.uint32)

    # incremental base-256 -> relaxed-16-bit fold (the A/B split of
    # _mont_reduce_wide): even col c adds to limb c//2; odd col c adds
    # its low byte (<<8) to limb (c-1)//2 and high bits to (c+1)//2
    half = c // 2

    @pl.when(c % 2 == 0)
    def _even():
        acc_ref[pl.ds(half, 1)] += col[None]

    @pl.when(c % 2 == 1)
    def _odd():
        acc_ref[pl.ds(half, 1)] += ((col & 0xFF) << 8)[None]
        acc_ref[pl.ds(half + 1, 1)] += (col >> 8)[None]

    @pl.when(c == c_count - 1)
    def _epilogue():
        p_arr = p_ref[:]  # (n, 1, LANES)
        pinv_arr = pinv_ref[:]

        def tchain(k, carry):
            t = acc_ref[k] + carry
            acc_ref[k] = t & MASK16
            return t >> 16

        jax.lax.fori_loop(0, 2 * n, tchain, zeros_block)

        macc_ref[...] = jnp.zeros(macc_ref.shape, jnp.uint32)

        def p2(i, _):
            ti = acc_ref[i]
            pr = ti[None, :, :] * pinv_arr
            macc_ref[pl.ds(i, n)] += pr & MASK16
            macc_ref[pl.ds(i + 1, n)] += pr >> 16
            return 0

        jax.lax.fori_loop(0, n, p2, 0)

        def mchain(k, carry):
            t = macc_ref[k] + carry
            macc_ref[k] = t & MASK16
            return t >> 16

        jax.lax.fori_loop(0, n, mchain, zeros_block)

        def p3(i, _):
            mi = macc_ref[i]
            pr = mi[None, :, :] * p_arr
            acc_ref[pl.ds(i, n)] += pr & MASK16
            acc_ref[pl.ds(i + 1, n)] += pr >> 16
            return 0

        jax.lax.fori_loop(0, n, p3, 0)

        def uchain(k, carry):
            t = acc_ref[k] + carry
            acc_ref[k] = t & MASK16
            return t >> 16

        jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)

        u = [acc_ref[n + k] for k in range(n)]
        for mult in chain:
            u = _cond_sub_ints(u, mult, n)
        o_ref[0] = jnp.stack(u, axis=0)

        if has_tw:
            # fused level-twiddle Montgomery multiply (v2 phase structure)
            _mont_mul_phases(
                n,
                o_ref.at[0],
                tw_ref[0],
                o_ref.at[0],
                acc_ref,
                macc_ref,
                p_arr,
                pinv_arr,
                zeros_block,
            )


@lru_cache(maxsize=None)
def _dft_reduce_call(field: Field, chain, size: int, has_tw: bool,
                     dot_impl: str, interpret: bool):
    n = field.n16
    P = 2 * n
    SP = size * P
    C = 4 * n - 1
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_dft_reduce_kernel, n, chain, p_list, SP, C, has_tw, dot_impl)
    p_arr = np.broadcast_to(
        np.asarray(p_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()
    pinv_arr = np.broadcast_to(
        np.asarray(pinv_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()

    def call(w_s8, w_sum_b, x_s8, tw4):
        """w_s8 (C, S, SP) int8; w_sum_b (C, S, LANES) int32;
        x_s8 (m_tiles, SP, LANES) int8 — m_tiles LEADING so the block's
        last two dims (SP, LANES) satisfy the Mosaic (8,128)-divisibility
        rule for any m_tiles; tw4 (tw_tiles, n, S, LANES) or None, where
        tw_tiles divides m_tiles (the BlockSpec index map wraps, so a
        twiddle pattern that repeats across the batch — e.g. the iNTT's
        1/N scale, tw_tiles = 1 — is never broadcast in HBM).
        Returns (m_tiles, n, S, LANES) Montgomery limbs."""
        m_tiles = x_s8.shape[0]
        grid = (m_tiles, C)
        wspec = pl.BlockSpec((1, size, SP), lambda i, c: (c, 0, 0))
        wsumspec = pl.BlockSpec((1, size, LANES), lambda i, c: (c, 0, 0))
        xspec = pl.BlockSpec((1, SP, LANES), lambda i, c: (i, 0, 0))
        ospec = pl.BlockSpec((1, n, size, LANES), lambda i, c: (i, 0, 0, 0))
        const_spec = pl.BlockSpec((n, 1, LANES), lambda i, c: (0, 0, 0))
        in_specs = [wspec, wsumspec, xspec]
        args = [w_s8, w_sum_b, x_s8]
        if has_tw:
            tw_tiles = tw4.shape[0]
            assert m_tiles % tw_tiles == 0
            in_specs.append(
                pl.BlockSpec(
                    (1, n, size, LANES),
                    lambda i, c: (i % tw_tiles, 0, 0, 0),
                )
            )
            args.append(tw4)
        in_specs += [const_spec, const_spec]
        args += [jnp.asarray(p_arr), jnp.asarray(pinv_arr)]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m_tiles, n, size, LANES), jnp.uint32),
            grid=grid,
            in_specs=in_specs,
            out_specs=ospec,
            scratch_shapes=[
                pltpu.VMEM((2 * n + 1, size, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, size, LANES), jnp.uint32),
                pltpu.VMEM((8, LANES), jnp.int32),
            ],
            interpret=interpret,
        )(*args)

    return call


def pallas_dft_reduce(field: Field, w_s8, w_sum_b, x_s8, chain, tw4=None,
                      dot_impl: str = "s8", interpret: bool = False):
    """Fused radix-`size` DFT matmul + wide Montgomery reduction
    (+ optional twiddle). dot_impl selects the in-kernel MXU contraction:
    "s8" (native int8 dot) or "bf16c" (chunked bf16 dots, exact; the
    fallback for Mosaic builds that reject the int8 matmul). See
    _dft_reduce_kernel."""
    size = w_s8.shape[1]
    return _dft_reduce_call(field, chain, size, tw4 is not None, dot_impl,
                            interpret)(w_s8, w_sum_b, x_s8, tw4)


# ------------------------------------------------- NTT level kernel (v2)
# The v1 fused kernel (_dft_reduce_kernel) folds the byte-plane
# convolution into the W operand: W grows to (C, S, S*P) int8 = 33 MB at
# n16 = 16, and every grid tile re-fetches all C blocks — ~33 MB of W
# traffic PER 16k-element tile (at N = 2^24 that is ~34 GB per level,
# several times the data itself), and the MXU contracts C = 4n-1 dots of
# depth S*P where the underlying algebra needs only P dots of depth S.
# It also takes pre-encoded int8 planes, so the host graph pays an
# encode pass plus layout transposes per level.
#
# v2 restructures the same exact integer computation:
#   * W is the PLAIN byte-plane DFT matrix, (P*S, S) bf16 = 1 MB,
#     fetched ONCE per level (constant BlockSpec) and VMEM-resident
#     across every grid tile — W traffic drops ~33 GB -> ~1 MB/level.
#   * x arrives as (m_tiles, n16, S, LANES) uint32 Montgomery limbs —
#     the kernel's OWN output layout — and the byte-plane encode happens
#     in VMEM, so the host graph needs one transpose per level and no
#     s8 encode pass.
#   * the contraction runs as P dots of depth S (one per x byte plane
#     qj): Z[(qi,k), m] = sum_j Wb[k,j,qi] * xb[j,qj,m]; the base-256
#     column c = qi + qj accumulates in a P-slot ring buffer (column c
#     is complete once qj = c, so live columns never exceed P). This
#     halves MXU work vs the folded form (P*S*S*P vs C*S*S*P MACs).
#   * bf16 operands make every product EXACT with no offset tricks:
#     bytes <= 255 are exact in bf16, each product < 2^16 is exact in
#     the f32 accumulator, and a depth-128 dot sums to < 2^23 < 2^24.
#     (No -128 offset => no sx/wsum correction terms at all.)
# The epilogue (A/B fold -> carry -> m -> m*p -> carry -> cond-sub
# chain -> optional fused twiddle Montgomery-mul) is the proven v1
# structure, bit-exact with ntt.matmul._mont_reduce_wide.
#
# Bounds: ring column <= P pairs * (S * 255 * 255) < 2^28 (uint32 ok,
# and under the < 2^31 bound the A/B fold analysis needs); acc rows
# follow the _wide_reduce_kernel analysis unchanged.


def _ntt_level_kernel(n, chain, has_tw, dot_impl, *refs):
    """One radix-S NTT level: in-VMEM byte encode + plane-dot DFT +
    wide Montgomery reduce + optional fused twiddle.

    Blocks: w_ref (P*S, S) byte planes (bf16 raw bytes, or int8
    offset-by-128 for dot_impl="s8"), row (qi*S + k), col j = byte qi of
    W[k, j]; x_ref / o_ref / tw_ref (1, n, S, LANES) uint32 limb-major
    tiles; scratch xp_ref (P, S, LANES) planes of x (same dtype as W),
    win_ref (2n+1, S, LANES) uint32 (column ring during the dot loop,
    macc during the epilogue), acc_ref (2n+1, S, LANES) uint32.

    dot_impl="bf16": raw bytes are exact in bf16, each product < 2^16
    is exact in the f32 accumulator, a depth-128 dot sums to < 2^23 —
    no corrections needed. dot_impl="s8": both operands offset by -128
    into int8 for the native MXU int8 path (~2x bf16 throughput); the
    exact value is recovered per dot as
      Z_true = Z_s8 + 128*sum_j x'[j,qj,m] + 128*sum_j w'[(qi,k),j]
               + 16384*S
    with the row term computed from an in-kernel lane-dim broadcast of
    the W chunk's row sums. All accumulation is mod 2^32 (int32->uint32
    converts wrap), and the true column values are exact and < 2^28, so
    the wrapped arithmetic is exact."""
    if has_tw:
        (w_ref, x_ref, tw_ref, p_ref, pinv_ref, o_ref,
         xp_ref, win_ref, acc_ref) = refs
    else:
        (w_ref, x_ref, p_ref, pinv_ref, o_ref,
         xp_ref, win_ref, acc_ref) = refs
    P = 2 * n
    S = x_ref.shape[2]
    zeros_block = jnp.zeros((S, LANES), jnp.uint32)
    s8 = dot_impl == "s8"

    # byte-plane encode in VMEM (limbs are proper 16-bit, so >> 8 needs
    # no mask); integers < 256 are exact in bf16
    for limb in range(n):
        v = x_ref[0, limb].astype(jnp.int32)
        lo = v & 0xFF
        hi = v >> 8
        if s8:
            xp_ref[2 * limb] = (lo - 128).astype(jnp.int8)
            xp_ref[2 * limb + 1] = (hi - 128).astype(jnp.int8)
        else:
            xp_ref[2 * limb] = lo.astype(jnp.bfloat16)
            xp_ref[2 * limb + 1] = hi.astype(jnp.bfloat16)

    win_ref[...] = jnp.zeros(win_ref.shape, jnp.uint32)
    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.uint32)

    def fold(c, colv):
        # base-256 column c -> relaxed 16-bit limbs (A/B split), c static
        half = c // 2
        if c % 2 == 0:
            acc_ref[pl.ds(half, 1)] += colv[None]
        else:
            acc_ref[pl.ds(half, 1)] += ((colv & 0xFF) << 8)[None]
            acc_ref[pl.ds(half + 1, 1)] += (colv >> 8)[None]

    # qi chunk size: bounds the (qchunk*S, LANES) dot output in VMEM
    qchunk = min(8, P)
    assert P % qchunk == 0
    w = w_ref[:]  # (P*S, S), VMEM-resident for the whole level
    for qj in range(P):
        xq = xp_ref[qj]  # (S, LANES)
        if s8:
            # 128 * sum_j x'[j, qj, m]: per-lane, broadcast over rows
            sx = (jnp.sum(xq.astype(jnp.int32), axis=0) * 128)[None, :]
        for qc in range(P // qchunk):
            wq = w[qc * qchunk * S:(qc + 1) * qchunk * S]
            if s8:
                z = jax.lax.dot_general(
                    wq, xq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (qchunk*S, LANES) int32, offset form
                # + 128*row-sums of w' (lane-dim broadcast) + sx + 128^2*S
                swr = (jnp.sum(wq.astype(jnp.int32), axis=1) * 128)[:, None]
                z = z + swr + sx + (128 * 128) * S
                zu = z.astype(jnp.uint32).reshape(qchunk, S, LANES)
            else:
                z = jax.lax.dot_general(
                    wq, xq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (qchunk*S, LANES) exact integers < 2^23
                zu = z.astype(jnp.int32).astype(jnp.uint32).reshape(
                    qchunk, S, LANES
                )
            # rows qi = qc*qchunk + r feed ring slot (qj + qi) mod P
            s0 = (qj + qc * qchunk) % P
            if s0 + qchunk <= P:
                win_ref[pl.ds(s0, qchunk)] += zu
            else:
                k1 = P - s0
                win_ref[pl.ds(s0, k1)] += zu[:k1]
                win_ref[pl.ds(0, qchunk - k1)] += zu[k1:]
        # column qj is complete (no qj' > qj contributes); fold and free
        # its slot for column qj + P (first written at step qj + 1)
        fold(qj, win_ref[qj % P])
        win_ref[pl.ds(qj % P, 1)] = zeros_block[None]

    for c in range(P, 2 * P - 1):
        fold(c, win_ref[c % P])

    # ---- epilogue: identical structure to _dft_reduce_kernel ----
    p_arr = p_ref[:]  # (n, 1, LANES)
    pinv_arr = pinv_ref[:]

    def tchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, tchain, zeros_block)

    win_ref[...] = jnp.zeros(win_ref.shape, jnp.uint32)  # macc role

    def p2(i, _):
        ti = acc_ref[i]
        pr = ti[None, :, :] * pinv_arr
        win_ref[pl.ds(i, n)] += pr & MASK16
        win_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p2, 0)

    def mchain(k, carry):
        t = win_ref[k] + carry
        win_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, n, mchain, zeros_block)

    def p3(i, _):
        mi = win_ref[i]
        pr = mi[None, :, :] * p_arr
        acc_ref[pl.ds(i, n)] += pr & MASK16
        acc_ref[pl.ds(i + 1, n)] += pr >> 16
        return 0

    jax.lax.fori_loop(0, n, p3, 0)

    def uchain(k, carry):
        t = acc_ref[k] + carry
        acc_ref[k] = t & MASK16
        return t >> 16

    jax.lax.fori_loop(0, 2 * n, uchain, zeros_block)

    u = [acc_ref[n + k] for k in range(n)]
    for mult in chain:
        u = _cond_sub_ints(u, mult, n)
    o_ref[0] = jnp.stack(u, axis=0)

    if has_tw:
        _mont_mul_phases(
            n, o_ref.at[0], tw_ref[0], o_ref.at[0],
            acc_ref, win_ref, p_arr, pinv_arr, zeros_block,
        )


@lru_cache(maxsize=None)
def _ntt_level_call(field: Field, chain, size: int, has_tw: bool,
                    dot_impl: str, interpret: bool):
    n = field.n16
    P = 2 * n
    p_list = tuple(int(v) for v in int_to_limbs(field.p, n))
    pinv_list = tuple(int(v) for v in int_to_limbs(field.p_inv_neg, n))
    kern = partial(_ntt_level_kernel, n, chain, has_tw, dot_impl)
    p_arr = np.broadcast_to(
        np.asarray(p_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()
    pinv_arr = np.broadcast_to(
        np.asarray(pinv_list, dtype=np.uint32)[:, None, None], (n, 1, LANES)
    ).copy()

    def call(w2, x4, tw4):
        """w2 (P*size, size) bf16; x4 (m_tiles, n, size, LANES) uint32;
        tw4 (tw_tiles, n, size, LANES) or None, where tw_tiles divides
        m_tiles: the twiddle pattern repeats every tw_tiles tiles (the
        four-step level twiddle depends only on the n2 coordinate, so a
        batched/LDE transform never materializes its broadcast over the
        batch — the BlockSpec index map wraps instead).
        Returns (m_tiles, n, size, LANES) Montgomery limbs."""
        m_tiles = x4.shape[0]
        grid = (m_tiles,)
        wspec = pl.BlockSpec((P * size, size), lambda i: (0, 0))
        tilespec = pl.BlockSpec((1, n, size, LANES), lambda i: (i, 0, 0, 0))
        const_spec = pl.BlockSpec((n, 1, LANES), lambda i: (0, 0, 0))
        in_specs = [wspec, tilespec]
        args = [w2, x4]
        if has_tw:
            tw_tiles = tw4.shape[0]
            assert m_tiles % tw_tiles == 0
            in_specs.append(
                pl.BlockSpec(
                    (1, n, size, LANES), lambda i: (i % tw_tiles, 0, 0, 0)
                )
            )
            args.append(tw4)
        in_specs += [const_spec, const_spec]
        args += [jnp.asarray(p_arr), jnp.asarray(pinv_arr)]
        # Raise Mosaic's default 16 MiB scoped-vmem cap: at m_tiles >= 64
        # (every shape past 2^16) the compiler's buffering pushed the
        # kernel to 16.47 MiB and the whole program failed to compile
        # (run4d steps 9-13) while the same block shapes at m_tiles = 4
        # fit. v5e has 128 MiB VMEM; 32 MiB is a limit, not a
        # reservation.
        import os as _os

        vmem_mb = int(_os.environ.get("HODOR_PALLAS_VMEM_MB", "32"))
        params = (
            {}
            if interpret
            else {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb << 20
            )}
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                (m_tiles, n, size, LANES), jnp.uint32
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=tilespec,
            scratch_shapes=[
                pltpu.VMEM(
                    (P, size, LANES),
                    jnp.int8 if dot_impl == "s8" else jnp.bfloat16,
                ),
                pltpu.VMEM((2 * n + 1, size, LANES), jnp.uint32),
                pltpu.VMEM((2 * n + 1, size, LANES), jnp.uint32),
            ],
            interpret=interpret,
            **params,
        )(*args)

    return call


def pallas_ntt_level(field: Field, w2, x4, chain, tw4=None,
                     dot_impl: str = "bf16", interpret: bool = False):
    """v2 fused NTT level: in-VMEM byte encode + plane-dot DFT + wide
    Montgomery reduce (+ optional fused twiddle). See _ntt_level_kernel.

    w2: (2*n16*size, size) byte-plane DFT matrix (row qi*size + k, col
    j = byte qi of W[k, j]) — bf16 raw bytes for dot_impl="bf16", int8
    offset-by-128 for "s8"; x4/tw4: (m_tiles, n16, size, LANES) uint32
    limb-major tiles."""
    size = w2.shape[1]
    return _ntt_level_call(field, chain, size, tw4 is not None,
                           dot_impl, interpret)(w2, x4, tw4)
