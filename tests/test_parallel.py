"""Multi-device sharding tests on an 8-way virtual CPU mesh.

The capability the reference lacks (SURVEY.md section 2, "Parallelism
strategies"): coset-sharded LDE and the four-step sharded NTT must agree
bit-exactly with the single-device kernels.
"""

import random

import jax
import numpy as np
import pytest

from hodor_tpu.field import F257, F_STARK, ops_for
from hodor_tpu.ntt import lde, ntt
from hodor_tpu.parallel import four_step_ntt, make_mesh, sharded_lde


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    return make_mesh(8)


def test_sharded_lde_matches_single(mesh8):
    field = F257
    ops = ops_for(field)
    random.seed(11)
    coeffs = [random.randrange(field.p) for _ in range(16)]
    a = ops.encode(coeffs)
    single = ops.decode(jax.jit(lambda x: lde(ops, x, 8))(a))
    sharded = ops.decode(jax.jit(lambda x: sharded_lde(ops, x, 8, mesh8))(a))
    assert list(single) == list(sharded)


def test_sharded_coset_lde_matches_single(mesh8):
    field = F_STARK
    ops = ops_for(field)
    random.seed(12)
    coeffs = [random.randrange(field.p) for _ in range(8)]
    a = ops.encode(coeffs)
    single = ops.decode(jax.jit(lambda x: lde(ops, x, 8, coset=True))(a))
    sharded = ops.decode(jax.jit(lambda x: sharded_lde(ops, x, 8, mesh8, coset=True))(a))
    assert list(single) == list(sharded)


def test_four_step_ntt_matches_single(mesh8):
    field = F257
    ops = ops_for(field)
    random.seed(13)
    n = 64
    coeffs = [random.randrange(field.p) for _ in range(n)]
    a = ops.encode(coeffs)
    single = ops.decode(jax.jit(lambda x: ntt(ops, x))(a))
    stepped = ops.decode(jax.jit(lambda x: four_step_ntt(ops, x, mesh8))(a))
    assert list(single) == list(stepped)


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
