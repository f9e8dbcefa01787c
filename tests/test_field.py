"""Field-layer unit tests: device limb kernels vs Python-int oracle.

Mirrors the reference's field sanity tests (src/experiments/mod.rs:23-51)
and batch-inversion test (src/polynomials/mod.rs:958-985).
"""

import random

import numpy as np
import pytest

from hodor_tpu.field import F257, F_BLS, F_P63, F_STARK, ops_for

FIELDS = [F257, F_STARK, F_BLS, F_P63]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_arith_vs_oracle(field):
    random.seed(42)
    ops = ops_for(field)
    n = 128
    xs = [random.randrange(field.p) for _ in range(n)]
    ys = [random.randrange(field.p) for _ in range(n)]
    a, b = ops.encode(xs), ops.encode(ys)
    mul = ops.decode(ops.jmul(a, b))
    add = ops.decode(ops.jadd(a, b))
    sub = ops.decode(ops.jsub(a, b))
    for i in range(n):
        assert mul[i] == xs[i] * ys[i] % field.p
        assert add[i] == (xs[i] + ys[i]) % field.p
        assert sub[i] == (xs[i] - ys[i]) % field.p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_edge_values(field):
    ops = ops_for(field)
    edge = [0, 1, field.p - 1, field.p - 2, field.p // 2]
    a = ops.encode(edge)
    sq = ops.decode(ops.jmul(a, a))
    for i, x in enumerate(edge):
        assert sq[i] == x * x % field.p
    neg = ops.decode(ops.sub(ops.encode([0] * len(edge)), a))
    for i, x in enumerate(edge):
        assert neg[i] == (-x) % field.p


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_batch_inverse(field):
    random.seed(7)
    # reference tests all power-of-two sizes <= 256 (src/polynomials/mod.rs:958-985)
    ops = ops_for(field)
    for size in [1, 2, 4, 64, 256]:
        xs = [random.randrange(1, field.p) for _ in range(size)]
        inv = ops.decode(ops.batch_inverse(ops.encode(xs)))
        for i in range(size):
            assert inv[i] * xs[i] % field.p == 1


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_two_adicity_and_root(field):
    # mirrors src/experiments/mod.rs:23-51
    p, S = field.p, field.S
    omega = field.root_of_unity
    assert pow(omega, 1 << S, p) == 1
    assert pow(omega, 1 << (S - 1), p) != 1
    g = field.generator
    assert pow(g, (p - 1) // 2, p) != 1  # true multiplicative generator


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_powers_and_sum(field):
    ops = ops_for(field)
    x = 12345 % field.p
    pw = ops.decode(ops.powers(ops.const(x), 33))
    for i in range(33):
        assert pw[i] == pow(x, i, field.p)
    total = ops.decode(ops.sum_reduce(ops.encode(list(range(100)))))
    assert int(total) == sum(range(100)) % field.p


def test_montgomery_roundtrip():
    field = F_STARK
    ops = ops_for(field)
    xs = [0, 1, field.p - 1, 2**200]
    enc = ops.encode(xs)
    canonical = ops.from_mont_arr(enc)
    import hodor_tpu.field.limbs as L

    raw = L.unpack_ints(np.asarray(canonical))
    for i, x in enumerate(xs):
        assert int(raw[i]) == x % field.p


def test_limb_headroom_invariant():
    """The relaxed Montgomery reduce requires num_bits <= 16*n16 - 1
    (u = (t + m*p)/R < 2p must fit n16 limbs). The 64-bit Goldilocks
    prime violates it in 4 limbs and must be REJECTED, not silently
    miscomputed (it proved-but-failed-verify when first tried)."""
    from hodor_tpu.field.field import Field
    from hodor_tpu.field.limbs import LimbOps

    goldilocks = Field(p=(1 << 64) - (1 << 32) + 1, generator=7, name="goldi")
    with pytest.raises(ValueError, match="headroom"):
        LimbOps(goldilocks)
