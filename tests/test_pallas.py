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
