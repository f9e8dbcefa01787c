"""Number-theoretic transforms on device.

The reference's FFT kernel zoo (src/fft/fft.rs radix-2, radix4_fft,
dit_fft pruning, lde.rs filtering-LDE, prefetch variants) collapses on
TPU into one batched, vectorized NTT expressed over limb arrays, plus an
LDE built the way the reference's `lde_using_multiple_cosets` does it
(src/polynomials/mod.rs:418-482): `factor` independent coset NTTs of size
T - never materializing an NTT larger than T - interleaved into natural
order on the blown-up domain. The multi-chip four-step decomposition
(the analog of `parallel_fft`, src/fft/fft.rs:68-125) lives in
hodor_tpu/parallel.

All functions take/return Montgomery limb arrays of shape (..., N, L).
They are pure jnp and trace into larger jitted programs.
"""

from __future__ import annotations

from functools import lru_cache

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..domain import Domain, log2_floor
from ..field.field import Field
from ..field.limbs import LimbOps, ops_for


@lru_cache(maxsize=None)
def bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _host_powers(field: Field, base: int, count: int) -> np.ndarray:
    """(count, L) Montgomery-form powers base^i computed with PYTHON
    ints on the host — trace-time table builders must never touch the
    device: eager mid-trace device work on the axon backend has OOM'd
    proves both via transfer-size limits (>=256 MB uploads, run4b
    step_1) and via allocations while prove state is resident (wave-3
    step_6)."""
    # Iterate directly in Montgomery form (to_mont(base^i) * base mod p
    # == to_mont(base^(i+1))) and batch the limb conversion through
    # to_bytes + frombuffer: one bigint mulmod per element remains (the
    # unavoidable host cost), but the per-element to_mont mulmod and the
    # int_to_limbs Python shift loop are gone (~5x on large tables,
    # ADVICE r04 low)
    p_mod = field.p
    width = 2 * field.n16
    vals = []
    cur = field.to_mont(1)
    for _ in range(count):
        vals.append(cur.to_bytes(width, "little"))
        cur = cur * base % p_mod
    arr = np.frombuffer(b"".join(vals), dtype="<u2").reshape(count, field.n16)
    return arr.astype(np.uint32)


@lru_cache(maxsize=None)
def _stage_twiddles(field: Field, log_n: int, inverse: bool):
    """Per-stage twiddle arrays for an N=2^log_n NTT: for stage s
    (block length 2^(s+1)) the array of w_len^j, j < 2^s, where
    w_len = omega^(N/len). Returned as a tuple of (2^s, L) host arrays.
    """
    n = 1 << log_n
    domain = Domain.new_for_size(field, n)
    omega = domain.generator_inv if inverse else domain.generator
    table = _host_powers(field, omega, max(n // 2, 1))
    stages = []
    for s in range(log_n):
        length = 2 << s
        stride = n // length
        stages.append(np.ascontiguousarray(table[::stride][: length // 2]))
    return tuple(stages)


@lru_cache(maxsize=None)
def _pease_tables(log_n: int):
    """Constant-geometry NTT schedule. Every stage works on the SAME
    shapes: gather pair halves u/v (N/2 rows each), butterfly, write back
    as concat([u', v']). The per-stage gather/twiddle indices are
    precomputed by simulating the layout of the classic in-place DIT
    (the algorithm of src/fft/fft.rs:21-66).

    Returns (idx_u, idx_v, tw_idx) as (log_n, N/2) int32 numpy arrays and
    final_perm (N,) mapping natural output position -> physical position.
    """
    n = 1 << log_n
    half_n = n // 2
    idx_u = np.zeros((log_n, half_n), dtype=np.int32)
    idx_v = np.zeros((log_n, half_n), dtype=np.int32)
    tw_idx = np.zeros((log_n, half_n), dtype=np.int32)
    # phys[q] = in-place position held at physical slot q; inv maps back
    inv = np.arange(n)  # in-place position -> physical slot (identity at start)
    k = np.arange(half_n)
    for s in range(log_n):
        length = 2 << s
        half = length >> 1
        u_pos = (k // half) * length + (k % half)
        v_pos = u_pos + half
        idx_u[s] = inv[u_pos]
        idx_v[s] = inv[v_pos]
        tw_idx[s] = (k % half) * (n // length)
        # new layout: slot k holds u_pos(k), slot half_n + k holds v_pos(k)
        inv = np.empty(n, dtype=np.int64)
        inv[u_pos] = k
        inv[v_pos] = half_n + k
    final_perm = inv.astype(np.int32)  # out[p] = x[inv[p]]
    return idx_u, idx_v, tw_idx, final_perm


@lru_cache(maxsize=None)
def _omega_table(field: Field, log_n: int, inverse: bool):
    """(N/2, L) powers of the domain generator (or its inverse), as a
    HOST numpy array (for compile-time-eval embedding in small graphs).
    For large tables prefer `omega_table_device`: this form re-uploads
    through the tunnel at use sites, and a single >=256 MB host->device
    transfer has been observed to kill the axon backend with
    ResourceExhausted (run4b step_1: the 2^18-row prove died uploading
    the h2 = 2^23 FRI table while the chip had >12 GiB free)."""
    n = 1 << log_n
    domain = Domain.new_for_size(field, n)
    omega = domain.generator_inv if inverse else domain.generator
    return _host_powers(field, omega, max(n // 2, 1))


@lru_cache(maxsize=None)
def omega_table_device(field: Field, log_n: int, inverse: bool):
    """(N/2, L) omega powers COMPUTED ON DEVICE (one jitted log-doubling
    powers program; only the (L,) seed crosses the tunnel). Cached per
    (field, log_n, inverse) so repeat proves reuse the resident array."""
    ops = ops_for(field)
    n = 1 << log_n
    domain = Domain.new_for_size(field, n)
    omega = domain.generator_inv if inverse else domain.generator
    seed = ops.const(omega)
    return jax.jit(
        lambda s: ops.powers(s, max(n // 2, 1)), static_argnums=()
    )(seed)


# stages <= this are unrolled (better fusion); above, the fori_loop
# constant-geometry form keeps compile time flat in log N.
_UNROLL_MAX_LOG_N = 8

# Pease omega tables above this many elements are built in-graph
# (chunked powers) instead of embedded as HLO literals
_TW_LITERAL_MAX_PEASE = 1 << 19


def ntt(ops: LimbOps, a, inverse: bool = False):
    """Natural-order DFT over the 2^k domain: out[k] = sum_j a[j] w^(jk)
    (w = domain generator; w^-1 when inverse - scaling by 1/N is NOT
    applied here, see `intt`). a: (..., N, L).

    Semantics match the reference's best_fft (src/fft/fft.rs:21-66): any
    exact DFT agrees. Dispatch (the analog of the reference's compile-time
    kernel selection, src/fft/mod.rs:28-58): small transforms unroll the
    log N butterfly stages (XLA fuses them); large transforms use the
    radix-128 MXU matmul path (ntt/matmul.py) when the field's reduction
    bounds allow it, else a constant-geometry (Pease) fori_loop schedule.
    """
    n = a.shape[-2]
    log_n = log2_floor(n)
    assert 1 << log_n == n
    if n == 1:
        return a
    if log_n <= _UNROLL_MAX_LOG_N:
        return _ntt_unrolled(ops, a, log_n, inverse)
    from .matmul import max_radix, ntt_matmul

    if max_radix(ops.field) >= 8:
        return ntt_matmul(ops, a, inverse)
    return _ntt_pease(ops, a, log_n, inverse)


def _ntt_unrolled(ops: LimbOps, a, log_n: int, inverse: bool):
    n = 1 << log_n
    L = a.shape[-1]
    stages = _stage_twiddles(ops.field, log_n, inverse)
    a = jnp.take(a, jnp.asarray(bit_reverse_indices(log_n)), axis=-2)
    lead = a.shape[:-2]
    for s in range(log_n):
        length = 2 << s
        half = length >> 1
        blocks = n // length
        a = a.reshape(lead + (blocks, length, L))
        u = a[..., :half, :]
        v = a[..., half:, :]
        t = ops.mul(v, stages[s])
        a = jnp.concatenate([ops.add(u, t), ops.sub(u, t)], axis=-2)
    return a.reshape(lead + (n, L))


def _ntt_pease(ops: LimbOps, a, log_n: int, inverse: bool):
    n = 1 << log_n
    half_n = n // 2
    idx_u, idx_v, tw_idx, final_perm = _pease_tables(log_n)
    if half_n > _TW_LITERAL_MAX_PEASE:
        # large Pease tables (F_BLS/F_P63 past 2^19): an (N/2, L) HLO
        # literal is 10s-100s of MB — it bloats the shipped program and
        # stalls XLA constant folding for minutes (observed: the 2^24
        # F_P63 multihost harness). Build in-graph from the seed with
        # the chunked powers chain instead; identical values.
        domain = Domain.new_for_size(ops.field, n)
        w = domain.generator_inv if inverse else domain.generator
        omega_table = ops.powers(ops.const(w), half_n)
    else:
        omega_table = _omega_table(ops.field, log_n, inverse)  # (N/2, L)
    idx_u = jnp.asarray(idx_u)
    idx_v = jnp.asarray(idx_v)
    tw_idx = jnp.asarray(tw_idx)
    # input starts in bit-reversed in-place order
    x = jnp.take(a, jnp.asarray(bit_reverse_indices(log_n)), axis=-2)

    def body(s, x):
        u = jnp.take(x, idx_u[s], axis=-2)
        v = jnp.take(x, idx_v[s], axis=-2)
        tw = jnp.take(omega_table, tw_idx[s], axis=0)
        t = ops.mul(v, tw)
        return jnp.concatenate([ops.add(u, t), ops.sub(u, t)], axis=-2)

    x = jax.lax.fori_loop(0, log_n, body, x)
    return jnp.take(x, jnp.asarray(final_perm), axis=-2)


def intt(ops: LimbOps, a):
    """Inverse NTT including the 1/N scale (reference Polynomial::ifft,
    src/polynomials/mod.rs:773-797: best_fft with omega^-1 then *minv).

    On the matmul path the 1/N multiply is folded into the terminal
    DFT level's fused twiddle (ntt_matmul's `scale`) instead of a
    separate full read+write pass over the array."""
    n = a.shape[-2]
    log_n = log2_floor(n)
    minv = ops.const(ops.field.inv(n % ops.field.p))
    if n > 1 and log_n > _UNROLL_MAX_LOG_N:
        from .matmul import max_radix, ntt_matmul

        if max_radix(ops.field) >= 8:
            return ntt_matmul(ops, a, inverse=True, scale=minv)
    out = ntt(ops, a, inverse=True)
    return ops.mul(out, minv)


def distribute_powers(ops: LimbOps, a, g_limbs):
    """a[i] *= g^i - the coset-shift primitive (src/fft/mod.rs:110-123).

    g_limbs: (L,) Montgomery scalar. a: (..., N, L).
    """
    n = a.shape[-2]
    pw = ops.powers(g_limbs, n)  # (N, L)
    return ops.mul(a, pw)


def coset_ntt(ops: LimbOps, a, gen_limbs=None):
    """NTT over the coset g*H (reference coset_fft,
    src/polynomials/mod.rs:626-638). gen defaults to the field's
    multiplicative generator."""
    if gen_limbs is None:
        gen_limbs = ops.const(ops.field.generator)
    return ntt(ops, distribute_powers(ops, a, gen_limbs))


def icoset_ntt(ops: LimbOps, a, geninv_limbs=None):
    """Inverse of coset_ntt (reference icoset_fft,
    src/polynomials/mod.rs:799-815)."""
    if geninv_limbs is None:
        geninv_limbs = ops.const(ops.field.inv(ops.field.generator))
    return distribute_powers(ops, intt(ops, a), geninv_limbs)


def _coset_generators(ops: LimbOps, t: int, factor: int, coset: bool):
    """Generators of the `factor` sub-cosets of the blown-up domain:
    Omega^i (times the multiplicative generator for the coset variant),
    as a (factor, L) Montgomery array.
    Mirrors src/polynomials/mod.rs:444-452 and :565-574."""
    big = Domain.new_for_size(ops.field, t * factor)
    gens = ops.powers(ops.const(big.generator), factor)  # (factor, L)
    if coset:
        gens = ops.mul(gens, ops.const(ops.field.generator))
    return gens


# batched-vs-sequential LDE switch, in u32 elements (see lde below);
# overridable per-run so the on-chip campaign can trade coset
# parallelism for peak temp without a code edit (HODOR_LDE_SEQ_MIN is
# the log2 of the element threshold)
_LDE_SEQUENTIAL_MIN = 1 << int(os.environ.get("HODOR_LDE_SEQ_MIN", "29"))


def lde(ops: LimbOps, coeffs, factor: int, coset: bool = False):
    """Low-degree extension by `factor` on the blown-up 2^k domain, in
    natural order: out[idx] = f((g*)Omega^idx), idx < T*factor.

    Exactly the reference's `lde_using_multiple_cosets`
    (src/polynomials/mod.rs:418-482) / `coset_lde_using_multiple_cosets`
    (:544-609): one NTT of size T per coset, then the interleave
    final[j*factor + c] = coset_c[j].

    coeffs: (..., T, L) -> (..., T*factor, L).
    """
    assert factor >= 1 and factor & (factor - 1) == 0
    if factor == 1:
        return coset_ntt(ops, coeffs) if coset else ntt(ops, coeffs)
    t = coeffs.shape[-2]
    L = coeffs.shape[-1]
    gens = _coset_generators(ops, t, factor, coset)  # (factor, L)
    # keep never-materializing-more-than-T the reference's way
    # (lde_using_multiple_cosets): for very big domains run the cosets
    # SEQUENTIALLY (lax.map) so peak memory stays O(T), exactly the
    # reference's memory-scaling trick (src/polynomials/mod.rs:418-482).
    # Threshold: 2^29 u32 elements = 2 GiB materialized batch - below
    # that the batched form easily fits v5e HBM and keeps all `factor`
    # coset NTTs in one parallel program (serializing them at 2^24 cost
    # the 2^16-row prove its coset parallelism for no memory benefit)
    big = t * factor * L * int(np.prod(coeffs.shape[:-2], dtype=np.int64) or 1)
    sequential = big >= _LDE_SEQUENTIAL_MIN

    def one_coset(g):
        pw = ops.powers(g, t)  # (T, L)
        return ntt(ops, ops.mul(coeffs, pw))  # (..., T, L)

    if sequential:
        evals = jax.lax.map(one_coset, gens)  # (factor, ..., T, L)
        evals = jnp.moveaxis(evals, 0, -3)  # (..., factor, T, L)
    else:
        pw = jax.vmap(lambda g: ops.powers(g, t))(gens)  # (factor, T, L)
        shifted = ops.mul(coeffs[..., None, :, :], pw)  # (..., factor, T, L)
        evals = ntt(ops, shifted)
    return _interleave(evals, t, factor, L)


# Above this many u32 elements the natural-order interleave transpose is
# row-chunked: XLA materializes the (..., T, factor, L) transpose with
# the (factor=16, L=16) pair in the tiled minor dims, padding BOTH 16s
# toward the (8, 128) tile — an 8x expansion that hit 16 GiB (= all of
# HBM) at the 2^20-row prove's f-LDE (run4b step_2: `u32[2,1048576,16,16]
# {2,1,3,0:T(8,128)} ... Extra memory due to padding: 14.00G`). Chunking
# bounds the padded temp to ~chunk*factor*512 bytes per map step.
_INTERLEAVE_CHUNK_MIN = 1 << 27
_INTERLEAVE_ROWS = 1 << 14


def _interleave(evals, t: int, factor: int, L: int):
    """(..., factor, T, L) -> (..., T*factor, L) natural-order
    interleave: out[j*factor + c] = evals[c, j]."""
    lead = evals.shape[:-3]
    if t * factor * L * int(np.prod(lead, dtype=np.int64) or 1) < _INTERLEAVE_CHUNK_MIN:
        ev = jnp.swapaxes(evals, -3, -2)  # (..., T, factor, L)
        return ev.reshape(lead + (t * factor, L))
    flat = evals.reshape((-1, factor, t, L))
    rows = min(_INTERLEAVE_ROWS, t)
    outs = []
    for b in range(flat.shape[0]):
        ev_b = flat[b]  # (factor, T, L)

        def _chunk(j0, ev_b=ev_b):
            sl = jax.lax.dynamic_slice_in_dim(ev_b, j0, rows, axis=1)
            return jnp.swapaxes(sl, 0, 1).reshape(rows * factor, L)

        out_b = jax.lax.map(_chunk, jnp.arange(t // rows) * rows)
        outs.append(out_b.reshape(t * factor, L))
    # lead dims looped in Python (they are tiny - the register count):
    # stacking is a concat, not a transpose, so no padded materialization
    return jnp.stack(outs, axis=0).reshape(lead + (t * factor, L))


def evaluate_at(ops: LimbOps, coeffs, x_limbs):
    """Evaluate a coefficient-form polynomial at scalar x
    (reference Polynomial::evaluate_at, src/polynomials/mod.rs:685-711).
    coeffs: (N, L); x_limbs: (L,). Returns (L,)."""
    n = coeffs.shape[-2]
    pw = ops.powers(x_limbs, n)
    return ops.sum_reduce(ops.mul(coeffs, pw), axis=-2)


def evaluate_at_domain_for_degree_one(
    ops: LimbOps, c0_limbs, c1_limbs, domain_size: int, coset: bool = False
):
    """Evaluate c0 + c1*X over the (possibly coset-shifted) domain
    (reference src/polynomials/mod.rs:229-258 and :260-290).
    Returns (domain_size, L)."""
    domain = Domain.new_for_size(ops.field, domain_size)
    start = ops.const(ops.field.generator) if coset else None
    xs = ops.powers(ops.const(domain.generator), domain.size, start=start)
    return ops.add(ops.mul(xs, c1_limbs), jnp.broadcast_to(c0_limbs, xs.shape))
