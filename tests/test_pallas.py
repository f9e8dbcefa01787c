"""Pallas kernel equivalence tests (interpret mode on the CPU backend).

The fused Montgomery-mul kernel must agree bit-exactly with the jnp
LimbOps.mul across fields and edge values.
"""

import random

import numpy as np
import pytest

from hodor_tpu.field import F257, F_BLS, F_STARK, ops_for
from hodor_tpu.field.pallas_kernels import pallas_mont_mul, pallas_ok


@pytest.mark.parametrize("field", [F257, F_STARK, F_BLS], ids=lambda f: f.name)
def test_pallas_mul_matches_jnp(field):
    random.seed(17)
    ops = ops_for(field)
    n = 4096
    xs = [random.randrange(field.p) for _ in range(n - 4)] + [0, 1, field.p - 1, field.p - 2]
    ys = [random.randrange(field.p) for _ in range(n - 4)] + [field.p - 1, 0, field.p - 1, 1]
    a, b = ops.encode(xs), ops.encode(ys)
    out = pallas_mont_mul(field, a, b, interpret=True)
    ref = ops.jmul(a, b)
    assert (np.asarray(out) == np.asarray(ref)).all()


def test_pallas_ok_shapes():
    assert pallas_ok((4096, 16), 16)
    assert pallas_ok((2, 2048, 16), 16)
    assert not pallas_ok((100, 16), 16)
    assert not pallas_ok((4096, 8), 16)


@pytest.mark.parametrize("field", [F257, F_STARK, F_BLS], ids=lambda f: f.name)
def test_pallas_mul_v2_matches_jnp(field):
    """v2 (the loop-structured kernel LimbOps.mul actually dispatches to
    on TPU, field/limbs.py:309-312) must be bit-exact incl. edge values."""
    from hodor_tpu.field.pallas_kernels import pallas_mont_mul_v2

    random.seed(23)
    ops = ops_for(field)
    n = 8192
    edge = [0, 1, field.p - 1, field.p - 2]
    xs = [random.randrange(field.p) for _ in range(n - 8)] + edge + edge
    ys = edge + [random.randrange(field.p) for _ in range(n - 8)] + [
        field.p - 1, field.p - 1, 1, 0,
    ]
    a, b = ops.encode(xs), ops.encode(ys)
    out = pallas_mont_mul_v2(field, a, b, interpret=True)
    ref = ops.jmul(a, b)
    assert (np.asarray(out) == np.asarray(ref)).all()


@pytest.mark.parametrize(
    "field",
    [F257, F_STARK,
     pytest.param(F_BLS, marks=pytest.mark.slow)],  # same limb count as F_STARK
    ids=lambda f: f.name,
)
def test_pallas_wide_reduce_matmul_ntt(field):
    """The fused wide-reduce(+twiddle) kernel (interpret mode) must make
    the matmul NTT bit-identical to its jnp reduction path."""
    import jax

    import hodor_tpu.ntt.matmul as mm

    rng = np.random.default_rng(31)
    ops = ops_for(field)
    # max domain limited by 2-adicity (F257: S=8 -> 256); kernel needs
    # >= 4096 elements, so batch the small field
    if field.S >= 12:
        shape = (1 << 12, ops.n16)
    else:
        shape = (32, 256, ops.n16)
    limbs = rng.integers(0, 1 << 16, size=shape, dtype=np.uint32)
    top_bits = field.num_bits - 16 * (ops.n16 - 1)
    limbs[..., -1] &= (1 << max(top_bits - 1, 1)) - 1
    a = jax.device_put(limbs)
    old = mm._FORCE_PALLAS
    try:
        mm._FORCE_PALLAS = False  # force jnp fallback
        ref = np.asarray(mm.ntt_matmul(ops, a))
        ref_inv = np.asarray(mm.ntt_matmul(ops, a, inverse=True))
        mm._FORCE_PALLAS = "interpret"
        got = np.asarray(mm.ntt_matmul(ops, a))
        got_inv = np.asarray(mm.ntt_matmul(ops, a, inverse=True))
    finally:
        mm._FORCE_PALLAS = old
    assert (ref == got).all()
    assert (ref_inv == got_inv).all()


@pytest.mark.parametrize("field", [F257, F_STARK, F_BLS], ids=lambda f: f.name)
@pytest.mark.parametrize("mode", ["add", "sub"])
def test_pallas_addsub_matches_jnp(field, mode):
    from hodor_tpu.field.pallas_kernels import pallas_addsub

    random.seed(19)
    ops = ops_for(field)
    n = 4096
    xs = [random.randrange(field.p) for _ in range(n - 2)] + [0, field.p - 1]
    ys = [random.randrange(field.p) for _ in range(n - 2)] + [field.p - 1, field.p - 1]
    a, b = ops.encode(xs), ops.encode(ys)
    got = pallas_addsub(field, a, b, mode, interpret=True)
    ref = ops.jadd(a, b) if mode == "add" else ops.jsub(a, b)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_pallas_blake2s_matches_jnp():
    """The fused blake2s kernel (interpret mode) must equal the jnp
    fori_loop compress for both leaf (32B) and node (64B) blocks."""
    import jax
    import jax.numpy as jnp

    import hodor_tpu.merkle.blake2s as b2

    rng = np.random.default_rng(41)
    n = 4096
    words = jnp.asarray(rng.integers(0, 1 << 32, size=(n, 16), dtype=np.uint64).astype(np.uint32))
    leaf_words = words.at[:, 8:].set(0)
    old = b2._FORCE_PALLAS
    try:
        b2._FORCE_PALLAS = False
        ref_leaf = np.asarray(b2.hash_block(leaf_words, 32))
        ref_node = np.asarray(b2.hash_block(words, 64))
        b2._FORCE_PALLAS = "interpret"
        got_leaf = np.asarray(b2.hash_block(leaf_words, 32))
        got_node = np.asarray(b2.hash_block(words, 64))
    finally:
        b2._FORCE_PALLAS = old
    assert (ref_leaf == got_leaf).all()
    assert (ref_node == got_node).all()
    # and against hashlib for one element
    import hashlib

    raw = np.asarray(leaf_words[0], dtype="<u4").tobytes()[:32]
    expect = hashlib.blake2s(raw, key=b2.KEY, person=b2.PERSONAL).digest()
    assert b2.digest_to_bytes(got_leaf[0]) == expect


@pytest.mark.parametrize("field", [F_STARK, F_BLS], ids=lambda f: f.name)
def test_pallas_fri_fold_matches_jnp(field):
    """The fused fold kernel (interpret mode) must produce bit-identical
    limbs to the 5-op jnp fold for stride 1 and 2."""
    import jax

    import hodor_tpu.fri.fri as fr
    from hodor_tpu.ntt import _omega_table

    random.seed(47)
    ops = ops_for(field)
    n = 8192
    vals = ops.encode([random.randrange(field.p) for _ in range(n)])
    challenge = ops.const(random.randrange(1, field.p))
    omegas_inv = jax.numpy.asarray(_omega_table(field, 13, True))
    old = fr._FORCE_PALLAS
    try:
        # round i folds a 2^(13-i)-element vector with stride 2^i
        for i, stride in ((0, 1), (1, 2)):
            v = vals[: n >> i]
            fr._FORCE_PALLAS = False
            ref = np.asarray(fr._fold_round_body(ops, v, challenge, stride, omegas_inv))
            fr._FORCE_PALLAS = "interpret"
            got = np.asarray(fr._fold_round_body(ops, v, challenge, stride, omegas_inv))
            assert (ref == got).all(), stride
    finally:
        fr._FORCE_PALLAS = old


@pytest.mark.parametrize("dot_impl", ["s8", "bf16c"])
def test_pallas_fused_dft_reduce_matches_two_step(dot_impl):
    """EXPERIMENTAL fused dot+reduce kernel (pallas_dft_reduce via
    _dft_matmul_fused): the in-kernel MXU dot + incremental column fold
    + Montgomery epilogue (+ fused twiddle) must be bit-exact with the
    two-step XLA-dot + wide-reduce path, with and without twiddles —
    for both the native-s8 and the chunked-bf16 contraction (the latter
    is the fallback for Mosaic builds that reject the int8 matmul)."""
    import jax
    import jax.numpy as jnp

    from hodor_tpu.field import F_STARK, ops_for
    from hodor_tpu.ntt import matmul as mm

    field = F_STARK
    ops = ops_for(field)
    rng = np.random.default_rng(17)
    # batch 128 rows of size-128 DFT -> m = 128 = one lane tile
    limbs = rng.integers(0, 1 << 16, size=(128, 128, ops.n16), dtype=np.uint32)
    limbs[..., -1] &= 0x7FF
    x = jnp.asarray(limbs)
    tw_limbs = rng.integers(0, 1 << 16, size=(128, 128, ops.n16), dtype=np.uint32)
    tw_limbs[..., -1] &= 0x7FF
    tw = jnp.asarray(tw_limbs)

    old = mm._FORCE_FUSED
    try:
        mm._FORCE_FUSED = False
        ref_plain = np.asarray(mm._dft_matmul(ops, x, 128, False))
        ref_tw = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
        mm._FORCE_FUSED = "interpret"
        mm._FUSED_IMPL = dot_impl
        jax.clear_caches()
        fused_plain = np.asarray(mm._dft_matmul(ops, x, 128, False))
        fused_tw = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
    finally:
        mm._FORCE_FUSED = old
        mm._FUSED_IMPL = None
        jax.clear_caches()
    assert (ref_plain == fused_plain).all()
    assert (ref_tw == fused_tw).all()


@pytest.mark.parametrize("impl", ["bf16", "s8"])
@pytest.mark.parametrize("field_name", ["F_STARK", "F_P63", "F257"])
def test_pallas_ntt_level_v2_matches_two_step(field_name, impl):
    """v2 NTT level kernel (pallas_ntt_level via _dft_matmul_fused_v2):
    in-VMEM byte encode + plane-dot ring accumulation + Montgomery
    epilogue (+ fused twiddle) must be bit-exact with the two-step XLA
    path, with and without twiddles, across limb widths (n16 = 16/4/2
    covers the qi-chunking and ring-size variants) and both in-kernel
    dot forms (exact-bf16 and offset-corrected native int8)."""
    import jax
    import jax.numpy as jnp

    from hodor_tpu.field import F257, F_P63, F_STARK, ops_for
    from hodor_tpu.ntt import matmul as mm

    field = {"F_STARK": F_STARK, "F_P63": F_P63, "F257": F257}[field_name]
    ops = ops_for(field)
    rng = np.random.default_rng(23)
    top = max(field.num_bits - 16 * (ops.n16 - 1) - 1, 1)
    limbs = rng.integers(0, 1 << 16, size=(128, 128, ops.n16), dtype=np.uint32)
    limbs[..., -1] &= (1 << top) - 1
    x = jnp.asarray(limbs)
    tw_limbs = rng.integers(0, 1 << 16, size=(128, 128, ops.n16), dtype=np.uint32)
    tw_limbs[..., -1] &= (1 << top) - 1
    tw = jnp.asarray(tw_limbs)

    old = mm._FORCE_V2
    try:
        mm._FORCE_V2 = False
        ref_plain = np.asarray(mm._dft_matmul(ops, x, 128, False))
        ref_tw = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
        mm._FORCE_V2 = "interpret"
        mm._V2_IMPL = impl
        jax.clear_caches()
        v2_plain = np.asarray(mm._dft_matmul(ops, x, 128, False))
        v2_tw = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
    finally:
        mm._FORCE_V2 = old
        mm._V2_IMPL = None
        jax.clear_caches()
    assert (ref_plain == v2_plain).all()
    assert (ref_tw == v2_tw).all()


def test_pallas_ntt_level_v2_tiled_twiddle():
    """When the twiddle's batch period is smaller than the full batch
    (an outer batch broadcasts over it — every LDE/batched level), the
    v2 path passes ONE period and wraps via the BlockSpec index map;
    the result must equal the materialized-broadcast reference."""
    import jax
    import jax.numpy as jnp

    from hodor_tpu.field import F_P63, ops_for
    from hodor_tpu.ntt import matmul as mm

    ops = ops_for(F_P63)
    rng = np.random.default_rng(37)
    # lead = (4, 128): outer batch 4 broadcasting over the tw period 128
    limbs = rng.integers(0, 1 << 16, size=(4, 128, 128, ops.n16), dtype=np.uint32)
    limbs[..., -1] &= 0x3FFF
    x = jnp.asarray(limbs)
    tw_limbs = rng.integers(0, 1 << 16, size=(128, 128, ops.n16), dtype=np.uint32)
    tw_limbs[..., -1] &= 0x3FFF
    tw = jnp.asarray(tw_limbs)

    old = mm._FORCE_V2
    try:
        mm._FORCE_V2 = False
        ref = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
        mm._FORCE_V2 = "interpret"
        jax.clear_caches()
        got = np.asarray(mm._dft_matmul(ops, x, 128, False, tw=tw))
    finally:
        mm._FORCE_V2 = old
        jax.clear_caches()
    assert (ref == got).all()


def test_pallas_ntt_level_v2_full_transform():
    """A full multi-level ntt_matmul with the v2 kernel forced must be
    bit-identical to the kernel-free transform (two radix-128 levels at
    N = 2^14, exercising the no-twiddle outer level and the fused
    twiddle inner level plus the inter-level layout plumbing)."""
    import jax
    import jax.numpy as jnp

    from hodor_tpu.field import F_P63, ops_for
    from hodor_tpu.ntt import matmul as mm

    ops = ops_for(F_P63)
    rng = np.random.default_rng(31)
    limbs = rng.integers(0, 1 << 16, size=(1 << 14, ops.n16), dtype=np.uint32)
    limbs[..., -1] &= 0x7FFF
    x = jnp.asarray(limbs)

    old = mm._FORCE_V2
    try:
        mm._FORCE_V2 = False
        ref = np.asarray(mm.ntt_matmul(ops, x))
        mm._FORCE_V2 = "interpret"
        jax.clear_caches()
        got = np.asarray(mm.ntt_matmul(ops, x))
    finally:
        mm._FORCE_V2 = old
        jax.clear_caches()
    assert (ref == got).all()
