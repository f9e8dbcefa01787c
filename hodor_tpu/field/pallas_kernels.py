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
