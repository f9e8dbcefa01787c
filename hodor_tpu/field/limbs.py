"""Device (JAX) prime-field arithmetic: u16-limb Montgomery kernels.

The reference gets field arithmetic from ff_ce's derive-generated 4x u64
Montgomery code (src/lib.rs:35-38). TPUs have no 64-bit integer multiply,
so here every field element is a little-endian vector of 16-bit limbs
stored in uint32 lanes (n16 = 4 * n64 limbs, so the Montgomery radix
R = 2^(16*n16) = 2^(64*n64) matches ff_ce exactly and raw-repr bytes are
bit-identical). All ops are elementwise over an arbitrary leading batch
shape: arrays have shape (..., n16), dtype uint32, values in Montgomery
form. Products of 16-bit limbs fit uint32 exactly; column sums are
bounded by 2n * (2^16-1) + carries < 2^22, so uint32 accumulation never
overflows.

This is pure jnp (fusable by XLA on TPU); a Pallas fused-NTT variant
lives in hodor_tpu/ntt.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .field import Field

MASK16 = jnp.uint32(0xFFFF)


@lru_cache(maxsize=None)
def _pallas_enabled(kernel: str | None = None) -> bool:
    """Pallas kernels only make sense on real TPU backends (interpret
    mode on CPU is slow). Gates, in priority order:

      HODOR_DISABLE_PALLAS=1            kill-switch for ALL kernels
      HODOR_DISABLE_PALLAS_<KERNEL>=1   kill-switch for one kernel
      HODOR_PALLAS_QUAL=<path>          JSON {kernel: bool} written by
                                        scripts/tpu_qualify.py; a kernel
                                        marked false (failed/hung the
                                        real Mosaic compile or produced
                                        wrong bits) is disabled so one
                                        bad compile degrades to the jnp
                                        path instead of killing a prove

    If HODOR_PALLAS_QUAL is unset, the default manifest written by the
    on-chip campaign (scripts/pallas_qual.json) is used when it exists,
    so any process on a machine where qualification has run — including
    the driver-invoked bench.py — engages exactly the qualified kernel
    set with no environment plumbing.

    Kernel names: mul, addsub, wide_reduce, blake2s, fri_fold,
    dft_reduce."""
    import json
    import os

    if os.environ.get("HODOR_DISABLE_PALLAS") == "1":
        return False
    if kernel is not None:
        if os.environ.get(f"HODOR_DISABLE_PALLAS_{kernel.upper()}") == "1":
            return False
        qual_path = os.environ.get("HODOR_PALLAS_QUAL")
        if qual_path == "none":
            # sentinel used by scripts/tpu_qualify.py: kernels must stay
            # enabled while being qualified, or the checks pass vacuously
            qual_path = None
        elif not qual_path:
            default_qual = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "scripts", "pallas_qual.json")
            if os.path.exists(default_qual):
                qual_path = default_qual
        if qual_path:
            try:
                with open(qual_path) as f:
                    table = json.load(f)
                if table.get(kernel) is not True:
                    return False
            except (OSError, ValueError):
                pass
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


# ---------------------------------------------------------------- packing

def int_to_limbs(value: int, n16: int) -> np.ndarray:
    return np.array([(value >> (16 * i)) & 0xFFFF for i in range(n16)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.uint64)
    return sum(int(l) << (16 * i) for i, l in enumerate(limbs))


def pack_ints(values, n16: int) -> np.ndarray:
    """Python ints (nested lists / 1-D / 2-D) -> (..., n16) uint32 limbs.
    Vectorized through int.to_bytes + frombuffer (fast enough for 2^20+
    witness columns)."""
    arr = np.asarray(values, dtype=object)
    flat = arr.reshape(-1)
    nbytes = 2 * n16
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in flat)
    out = np.frombuffer(buf, dtype="<u2").astype(np.uint32).reshape(arr.shape + (n16,))
    return out


def unpack_ints(limbs) -> np.ndarray:
    """(..., n16) uint32 limbs -> object array of Python ints."""
    limbs = np.asarray(limbs)
    shape = limbs.shape[:-1]
    flat = limbs.reshape(-1, limbs.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        out[i] = limbs_to_int(flat[i])
    return out.reshape(shape) if shape else out[0]


# ------------------------------------------------------- low-level helpers

@lru_cache(maxsize=1)
def _scan_carries() -> bool:
    """Carry chains as lax.scan (tiny traced body, one HLO while-loop)
    instead of an unrolled Python loop (n_out repeated add/mask/shift
    blocks). The unrolled form lets XLA fuse the whole chain into few
    kernels — right for the TPU fallback path — but it is why one
    F_STARK Montgomery mul traces to ~300 ops and every jit of every
    shape costs minutes cold (VERDICT r03: 42-min cold test suite,
    2-minute dryrun compiles). On CPU backends (tests, the driver's
    multichip dryrun) compile time dominates runtime, so scan wins.
    Override with HODOR_SCAN_CARRIES=0/1."""
    import os

    v = os.environ.get("HODOR_SCAN_CARRIES")
    if v in ("0", "1"):
        return v == "1"
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


def _carry_propagate(cols, n_out: int):
    """cols: (..., >=n_out) uint32 with values < 2^22; returns (..., n_out)
    fully carried 16-bit limbs (any final carry beyond n_out is dropped)."""
    ncols = cols.shape[-1]
    if _scan_carries():
        if ncols < n_out:
            cols = jnp.concatenate(
                [cols, jnp.zeros(cols.shape[:-1] + (n_out - ncols,), jnp.uint32)],
                axis=-1,
            )
        x = jnp.moveaxis(cols[..., :n_out], -1, 0)  # (n_out, ...)

        def body(carry, c):
            t = c + carry
            return t >> 16, t & MASK16

        _, out = jax.lax.scan(body, jnp.zeros(x.shape[1:], jnp.uint32), x)
        return jnp.moveaxis(out, 0, -1)
    outs = []
    carry = jnp.zeros(cols.shape[:-1], jnp.uint32)
    for k in range(n_out):
        t = (cols[..., k] if k < ncols else jnp.zeros_like(carry)) + carry
        outs.append(t & MASK16)
        carry = t >> 16
    return jnp.stack(outs, axis=-1)


@lru_cache(maxsize=None)
def _conv_matrix_plain(n: int, n_out: int) -> np.ndarray:
    """(n*n, n_out) 0/1 scatter: row i*n+j feeds column i+j (dropped if
    >= n_out). For convolving SMALL-valued limbs without lo/hi splitting."""
    e = np.zeros((n * n, n_out), dtype=np.int32)
    for i in range(n):
        for j in range(n):
            if i + j < n_out:
                e[i * n + j, i + j] = 1
    return e


@lru_cache(maxsize=None)
def _conv_matrix_shift(n: int, n_out: int) -> np.ndarray:
    """(n*n, n_out) 0/1 scatter: row i*n+j feeds column i+j+1."""
    e = np.zeros((n * n, n_out), dtype=np.int32)
    for i in range(n):
        for j in range(n):
            if i + j + 1 < n_out:
                e[i * n + j, i + j + 1] = 1
    return e


def _dot_i32(flat, e):
    return jax.lax.dot_general(
        flat.astype(jnp.int32), jnp.asarray(e),
        (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.uint32)


@lru_cache(maxsize=None)
def _conv_matrix(n: int) -> np.ndarray:
    """(2*n*n, 2n) 0/1 scatter matrix: row i*n+j of the `lo` half feeds
    column i+j; row i*n+j of the `hi` half feeds column i+j+1. Turns the
    schoolbook anti-diagonal sums into ONE int32 matmul (MXU/VPU-friendly
    and tiny in HLO)."""
    e = np.zeros((2 * n * n, 2 * n), dtype=np.int32)
    for i in range(n):
        for j in range(n):
            e[i * n + j, i + j] = 1
            hi_col = i + j + 1
            if hi_col < 2 * n:
                e[n * n + i * n + j, hi_col] = 1
    return e


def _outer_flat(a, b):
    """(..., n) x (..., n) -> (..., n*n) elementwise partial products
    prod[i*n+j] = a_i * b_j, built WITHOUT a (..., n, n) intermediate:
    a trailing dim of n (16) tile-pads to 128 lanes on TPU — 8x memory —
    and XLA materialized exactly that shape at 32 GiB inside the 2^20-row
    cubic stage1 compile (campaign r04 step 29: `u32[4,1048576,16,16]
    {T(8,128)} would exceed memory`). The flattened n*n (256) minor dim
    is tile-exact."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    a_e = jnp.broadcast_to(a[..., :, None], lead + (n, n)).reshape(lead + (n * n,))
    b_e = jnp.broadcast_to(b[..., None, :], lead + (n, n)).reshape(lead + (n * n,))
    return a_e * b_e


def _mul_cols(a, b):
    """Schoolbook column sums of two (..., n)-limb numbers -> (..., 2n)
    uncarried columns (each < 2^22): split each 32-bit partial product
    into 16-bit halves, then scatter-sum via one dot_general."""
    n = a.shape[-1]
    prod = _outer_flat(a, b)  # (..., n*n) uint32, exact
    lo = prod & MASK16
    hi = prod >> 16
    flat = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int32)
    e = jnp.asarray(_conv_matrix(n))
    cols = jax.lax.dot_general(
        flat, e, (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return cols.astype(jnp.uint32)


def _carryless_mul_cols_trunc(a, b, n_out: int):
    """Column sums of a*b truncated to the low n_out columns (mod 2^(16*n_out)),
    inputs proper 16-bit limbs, output relaxed columns < 2^21."""
    n = a.shape[-1]
    prod = _outer_flat(a, b)
    lo = prod & MASK16
    hi = prod >> 16
    flat = jnp.concatenate([lo, hi], axis=-1)
    e = np.concatenate(
        [_conv_matrix_plain(n, n_out), _conv_matrix_shift(n, n_out)], axis=0
    )
    return _dot_i32(flat, e)


def _mul_full(a, b):
    """(..., n) x (..., n) -> (..., 2n) carried limbs of the full product."""
    n = a.shape[-1]
    return _carry_propagate(_mul_cols(a, b), 2 * n)


def _mul_lo(a, b, n: int):
    """Low n limbs of a*b (mod 2^(16n))."""
    return _carry_propagate(_mul_cols(a, b), n)


def _sub_with_borrow(a, b):
    """Limbwise a - b; returns (diff limbs, borrow flag (0/1) per element)."""
    n = a.shape[-1]
    if _scan_carries():
        av = jnp.moveaxis(a, -1, 0)
        bv = jnp.moveaxis(b, -1, 0)

        def body(borrow, ab):
            ak, bk = ab
            t = ak + jnp.uint32(0x10000) - bk - borrow
            return jnp.uint32(1) - (t >> 16), t & MASK16

        borrow, out = jax.lax.scan(
            body, jnp.zeros(a.shape[:-1], jnp.uint32), (av, bv)
        )
        return jnp.moveaxis(out, 0, -1), borrow
    outs = []
    borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
    for k in range(n):
        t = a[..., k] + jnp.uint32(0x10000) - b[..., k] - borrow
        outs.append(t & MASK16)
        borrow = jnp.uint32(1) - (t >> 16)
    return jnp.stack(outs, axis=-1), borrow


def _add_limbs(a, b, n_out=None):
    n = a.shape[-1]
    if n_out is None:
        n_out = n
    return _carry_propagate(a + b, n_out)


# --------------------------------------------------------------- LimbOps

class LimbOps:
    """Montgomery field ops over (..., n16) uint32 limb arrays.

    Values are in Montgomery form (x * R mod p). `mul` is a full SOS
    Montgomery multiply; `add`/`sub` are carried limb ops with conditional
    +-p. Constants (p, p', R mod p, R^2 mod p ...) are baked in as numpy
    arrays so everything traces into a single XLA graph.
    """

    def __init__(self, field: Field):
        self.field = field
        n16 = field.n16
        self.n16 = n16
        # Headroom invariant of the relaxed Montgomery reduce: the
        # pre-subtraction value u = (t + m*p)/R < 2p must fit n16 limbs,
        # so p needs at least one spare top bit (t + m*p < 2pR must fit
        # 2*n16 limbs). A field at exactly 16*n16 bits (e.g. the 64-bit
        # Goldilocks prime in 4 limbs) silently drops the top carry and
        # produces wrong products.
        if field.num_bits > 16 * n16 - 1:
            raise ValueError(
                f"{field}: num_bits={field.num_bits} needs headroom; "
                f"the u16-limb Montgomery kernels require num_bits <= "
                f"{16 * n16 - 1} for n16={n16} limbs"
            )
        self.p_limbs = jnp.asarray(int_to_limbs(field.p, n16))
        self.pinv_limbs = jnp.asarray(int_to_limbs(field.p_inv_neg, n16))
        self.zero_m = jnp.asarray(int_to_limbs(0, n16))
        self.one_m = jnp.asarray(int_to_limbs(field.R_mod_p, n16))
        self.r2 = jnp.asarray(int_to_limbs(field.R2_mod_p, n16))
        self.two_inv_m = jnp.asarray(
            int_to_limbs(field.to_mont(field.inv(2)), n16)
        )

    # -- encode / decode (host) --

    def encode(self, values) -> jnp.ndarray:
        """Python ints (canonical) -> Montgomery limb array on device.
        Packing is host-vectorized; the Montgomery conversion (mul by R^2)
        runs on device so encoding 2^20-row witnesses stays fast."""
        packed = jnp.asarray(pack_ints(values, self.n16))
        if packed.size == 0:
            return packed
        return self._encode_tail(packed)

    @partial(jax.jit, static_argnums=0)
    def _encode_tail(self, packed):
        return self.to_mont_arr(packed)

    def decode(self, limbs) -> np.ndarray:
        """Montgomery limb array -> object ndarray of canonical ints."""
        f = self.field
        raw = unpack_ints(np.asarray(jax.device_get(limbs)))
        rinv = pow(f.R, -1, f.p)
        if isinstance(raw, np.ndarray):
            return np.vectorize(lambda v: (int(v) * rinv) % f.p, otypes=[object])(raw)
        return (int(raw) * rinv) % f.p

    def const(self, value: int) -> jnp.ndarray:
        """Single canonical int -> (n16,) Montgomery limbs."""
        return jnp.asarray(int_to_limbs(self.field.to_mont(value), self.n16))

    # -- core arithmetic (traceable) --

    def _cond_sub_p(self, u):
        diff, borrow = _sub_with_borrow(u, jnp.broadcast_to(self.p_limbs, u.shape))
        return jnp.where((borrow == 0)[..., None], diff, u)

    def add(self, a, b, allow_pallas: bool = True):
        a, b = jnp.broadcast_arrays(a, b)
        if allow_pallas and _pallas_enabled("addsub"):
            from .pallas_kernels import pallas_addsub, pallas_ok

            if pallas_ok(a.shape, self.n16):
                return pallas_addsub(self.field, a, b, "add")
        return self._cond_sub_p(_add_limbs(a, b))

    def sub(self, a, b, allow_pallas: bool = True):
        a, b = jnp.broadcast_arrays(a, b)
        if allow_pallas and _pallas_enabled("addsub"):
            from .pallas_kernels import pallas_addsub, pallas_ok

            if pallas_ok(a.shape, self.n16):
                return pallas_addsub(self.field, a, b, "sub")
        d, borrow = _sub_with_borrow(a, b)
        corrected = _add_limbs(d, jnp.broadcast_to(self.p_limbs, d.shape))
        return jnp.where((borrow == 1)[..., None], corrected, d)

    def neg(self, a):
        return self.sub(jnp.broadcast_to(self.zero_m, a.shape), a)

    def mont_reduce(self, t):
        """t: (..., 2n) carried limbs, t < p*R -> (..., n) = t * R^-1 mod p."""
        n = self.n16
        m = _mul_lo(t[..., :n], jnp.broadcast_to(self.pinv_limbs, t[..., :n].shape), n)
        mp = _mul_full(m, jnp.broadcast_to(self.p_limbs, m.shape))
        u = _add_limbs(t, mp, 2 * n)  # low n limbs are zero by construction
        return self._cond_sub_p(u[..., n:])

    def mul(self, a, b, allow_pallas: bool = True):
        """Montgomery multiply with relaxed (uncarried) intermediates.

        On TPU backends, eligible shapes dispatch to the fused Pallas
        kernel (field/pallas_kernels.py; ~50x faster than the XLA
        elementwise path, which fragments into many HBM-bound fusions).

        Keeps column sums un-normalized wherever exactness allows it, so
        the graph has only TWO sequential carry chains (m-normalization,
        n steps; final sum, 2n steps) instead of the naive five - this
        roughly halves both the compiled HLO size and the runtime
        critical path of every field multiply.
        """
        a, b = jnp.broadcast_arrays(a, b)
        if allow_pallas and _pallas_enabled("mul"):
            from .pallas_kernels import pallas_mont_mul_v2, pallas_ok

            if pallas_ok(a.shape, self.n16):
                return pallas_mont_mul_v2(self.field, a, b)
        n = self.n16
        t_cols = _mul_cols(a, b)  # (..., 2n) relaxed, < 2^22

        # m = (t mod R) * p' mod R: split t's low columns into 16-bit and
        # small-carry parts (value stays congruent mod R), convolve each
        # with p', then normalize m with one n-step carry chain.
        t_lo = t_cols[..., :n]
        lo16 = t_lo & MASK16
        hi6 = t_lo >> 16  # < 2^6
        pinv = jnp.broadcast_to(self.pinv_limbs, lo16.shape)
        m_cols = _carryless_mul_cols_trunc(lo16, pinv, n)
        hi_prod = _outer_flat(hi6, pinv)  # (..., n*n), tile-exact minor
        m_cols = m_cols + _dot_i32(hi_prod, _conv_matrix_shift(n, n))
        m = _carry_propagate(m_cols, n)  # exact 16-bit limbs of m

        # u = t + m*p, all relaxed; one 2n-step chain then >>16n, cond-sub
        mp_cols = _mul_cols(m, jnp.broadcast_to(self.p_limbs, m.shape))
        u = _carry_propagate(t_cols + mp_cols, 2 * n)
        return self._cond_sub_p(u[..., n:])

    def square(self, a):
        return self.mul(a, a)

    def pow_static(self, a, e: int):
        """a^e for a STATIC Python-int exponent (square-and-multiply,
        unrolled at trace time). Use only for small or power-of-two e."""
        if e == 0:
            return jnp.broadcast_to(self.one_m, a.shape)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result

    def to_mont_arr(self, canonical_limbs):
        """Canonical-form limbs -> Montgomery form (mul by R^2)."""
        return self.mul(canonical_limbs, jnp.broadcast_to(self.r2, canonical_limbs.shape))

    def from_mont_arr(self, mont_limbs):
        """Montgomery form -> canonical-form limbs (Montgomery reduce by 1)."""
        n = self.n16
        t = jnp.concatenate(
            [mont_limbs, jnp.zeros(mont_limbs.shape[:-1] + (n,), jnp.uint32)], axis=-1
        )
        return self.mont_reduce(t)

    def is_zero(self, a):
        """Boolean mask (...,) - works for Montgomery or canonical form."""
        return jnp.all(a == 0, axis=-1)

    def select(self, mask, a, b):
        """mask (...,) bool -> where(mask, a, b) elementwise over limbs."""
        return jnp.where(mask[..., None], a, b)

    # -- derived bulk ops --

    # powers() chunking threshold: above this the log-doubling form's
    # LAST doubling is one unfused mul over n/2 elements, whose jnp limb
    # convolution keeps several (n/2, (2n16)^2) u32 intermediates live -
    # 25.5 GiB at n = 2^24 on the TPU compile (run4d step_2: the DEEP
    # stage's _domain_points(2^24) program OOM'd HBM at compile time).
    # Chunking caps every mul at POWERS_CHUNK elements via lax.map.
    POWERS_CHUNK = 1 << 16

    def powers(self, x, n: int, start=None):
        """[s, s*x, s*x^2, ..., s*x^(n-1)] for scalar limb x (Montgomery).

        Log-doubling: log2(n) vectorized steps; n need not be a power of 2.
        `start` defaults to 1. Above POWERS_CHUNK elements the table is
        built block-wise (base table of POWERS_CHUNK powers, then one
        lax.map step per block multiplying by x^(B*k)) so peak temp
        memory is O(POWERS_CHUNK), not O(n).
        """
        s = self.one_m if start is None else start
        # Chunk-block muls use the FUSED Pallas kernel when qualified:
        # the jnp fallback's ~135-kernel unfused mul graph per block,
        # scanned 128x per table and ~41 tables per FRI ladder, cost the
        # first 2^20-row prove 787 s of launch overhead (run5i step_1).
        # Pallas also allows 8x bigger blocks (its temps are VMEM-sized,
        # not the (B, 256)-wide jnp convolution intermediates).
        use_pallas = _pallas_enabled("mul")
        B = (self.POWERS_CHUNK * 8) if use_pallas else self.POWERS_CHUNK
        if n > 2 * B:
            base = self.powers(x, B, start=s)  # (B, L): s * x^i
            xB = x
            b = B
            while b > 1:  # x^B by repeated squaring (B is a power of two)
                xB = self.square(xB)
                b //= 2
            nblocks = -(-n // B)
            factors = self.powers(xB, nblocks)  # (nblocks, L): x^(B*k)
            out = jax.lax.map(
                lambda f: self.mul(
                    jnp.broadcast_to(f[None, :], base.shape), base,
                    allow_pallas=use_pallas,
                ),
                factors,
            )  # (nblocks, B, L)
            return out.reshape(nblocks * B, self.n16)[:n]
        out = s[None, :]
        step = x  # x^(2^k) after k doublings
        total = 1
        while total < n:
            take = min(total, n - total)
            # allow_pallas=False: powers() runs under vmap in the LDE
            # fan-out and the odd shapes stay small anyway
            nxt = self.mul(out[:take], step[None, :], allow_pallas=False)
            out = jnp.concatenate([out, nxt], axis=0)
            if total * 2 < n:
                step = self.square(step)
            total *= 2
        return out[:n]

    def sum_reduce(self, arr, axis=0):
        """Field sum along an axis via a binary tree of modular adds."""
        n = arr.shape[axis]
        arr = jnp.moveaxis(arr, axis, 0)
        while n > 1:
            half = n // 2
            paired = self.add(arr[:half], arr[half : 2 * half])
            if n % 2:
                paired = jnp.concatenate([paired, arr[2 * half : n]], axis=0)
            arr = paired
            n = paired.shape[0]
        return arr[0]

    def prod_scan(self, arr, reverse: bool = False):
        """Inclusive prefix products along axis 0 (Hillis-Steele: log2(n)
        full-array muls, minimal HLO)."""
        n = arr.shape[0]
        ones = jnp.broadcast_to(self.one_m, arr.shape)
        shift = 1
        while shift < n:
            if reverse:
                shifted = jnp.concatenate([arr[shift:], ones[:shift]], axis=0)
            else:
                shifted = jnp.concatenate([ones[:shift], arr[:-shift]], axis=0)
            arr = self.mul(arr, shifted)
            shift *= 2
        return arr

    def inv_fermat(self, x):
        """x^(p-2) via a fori_loop over the exponent bits (traced once, so
        the graph stays small; ~2*nbits sequential tiny muls at runtime).
        Intended for SINGLE elements or small batches - for large arrays
        use `batch_inverse` (Montgomery's trick + one Fermat inverse)."""
        e = self.field.p - 2
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
        )

        def body(i, acc):
            acc = self.square(acc)
            with_mul = self.mul(acc, x)
            return jnp.where((bits[i] == 1)[..., None], with_mul, acc)

        init = jnp.broadcast_to(self.one_m, x.shape)
        return jax.lax.fori_loop(0, nbits, body, init)

    def batch_inverse(self, arr):
        """Elementwise inverse of (N, n16) via a product tree.

        The role of Polynomial::batch_inversion
        (src/polynomials/mod.rs:889-954): one Fermat inversion of the
        grand product, everything else multiplies. The reference's
        sequential prefix walk becomes a log-depth product TREE
        (up-sweep pairwise products, then a down-sweep distributing the
        root inverse), costing ~3N vectorized muls total - the
        Hillis-Steele prefix scan this replaces cost 2N*log2(N).
        Fully traceable (no host round trip). NOTE: unlike the reference
        (which returns Err), a zero element yields garbage in trace
        mode - call `assert_nonzero` outside jit where the reference
        semantics matter.
        """
        n = arr.shape[0]
        if n == 1:
            return self.inv_fermat(arr[0])[None, :]
        from ..domain import next_power_of_two

        n_pad = next_power_of_two(n)
        if n_pad != n:
            pad = jnp.broadcast_to(self.one_m, (n_pad - n, self.n16))
            work = jnp.concatenate([arr, pad], axis=0)
        else:
            work = arr
        # up-sweep pairing is (i, i + m/2), NOT (2i, 2i+1): contiguous
        # half-slices instead of strided ones, and the down-sweep
        # re-assembly is a CONCAT instead of an interleave — the old
        # jnp.stack([...], axis=1).reshape put a (m/2, 2, L) copy in the
        # program whose T(2,128) tiling pads the (2, 16) minors 8x:
        # 32 GiB at the DEEP stage's (4 masks x 2^24)-element inversion
        # (run5 step_11 compile OOM). Inverses are unique, so the tree
        # shape cannot change any output value.
        levels = [work]
        cur = work
        while cur.shape[0] > 1:
            half = cur.shape[0] // 2
            cur = self.mul(cur[:half], cur[half:])
            levels.append(cur)
        inv = self.inv_fermat(cur[0])[None, :]  # inverse of the grand product
        # down-sweep: inv of each node from its parent's inverse and its
        # sibling's product
        for lvl in reversed(levels[:-1]):
            half = lvl.shape[0] // 2
            a, b = lvl[:half], lvl[half:]
            inv = jnp.concatenate([self.mul(inv, b), self.mul(inv, a)], axis=0)
        return inv[:n]

    def assert_nonzero(self, arr):
        """Host-side check matching the reference's Err on zero elements."""
        if bool(jnp.any(self.is_zero(arr))):
            from ..errors import DivisionByZeroError

            raise DivisionByZeroError("batch inversion of a zero element")

    def _batch_inverse_tail(self, arr, prefix, total_inv):
        # suffix[i] = a_i * ... * a_{n-1}
        suffix = self.prod_scan(arr, reverse=True)
        n = arr.shape[0]
        # inv(a_i) = P[i-1] * S[i+1] * total_inv
        left = jnp.concatenate([self.one_m[None, :], prefix[: n - 1]], axis=0)
        right = jnp.concatenate([suffix[1:], self.one_m[None, :]], axis=0)
        return self.mul(self.mul(left, right), total_inv)

    # -- jitted entry points for direct use --

    @partial(jax.jit, static_argnums=0)
    def jadd(self, a, b):
        return self.add(a, b)

    @partial(jax.jit, static_argnums=0)
    def jsub(self, a, b):
        return self.sub(a, b)

    @partial(jax.jit, static_argnums=0)
    def jmul(self, a, b):
        return self.mul(a, b)

    def __hash__(self):
        return hash(self.field)

    def __eq__(self, other):
        return isinstance(other, LimbOps) and other.field == self.field


@lru_cache(maxsize=None)
def ops_for(field: Field) -> LimbOps:
    return LimbOps(field)
