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


@pytest.mark.slow
def test_mesh_prove_byte_identical(mesh8):
    """A full prove on the 8-device mesh must serialize to the SAME
    bytes as the single-device proof (sharding is a layout choice, not a
    protocol change). VERDICT round-1 item 3."""
    from hodor_tpu.models import VDF
    from hodor_tpu.proof_io import serialize_proof
    from hodor_tpu.prover import Prover
    from hodor_tpu.verifier import Verifier

    field = F_STARK
    witness, props = VDF(field, 1, 2, 31).into_arp()  # T = 32 rows
    single = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof_single = single.prove(witness)
    meshed = Prover(
        props.clone(), lde_factor=16, fri_final_degree_plus_one=1, mesh=mesh8
    )
    proof_mesh = meshed.prove(witness)
    assert serialize_proof(proof_mesh, field) == serialize_proof(proof_single, field)
    assert Verifier(props, lde_factor=16).verify(proof_mesh)


@pytest.mark.slow  # the driver runs dryrun_multichip separately every round
def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_four_step_intt_matches_single(mesh8):
    from hodor_tpu.ntt import intt
    from hodor_tpu.parallel import four_step_intt

    field = F_STARK
    ops = ops_for(field)
    random.seed(14)
    n = 64
    coeffs = [random.randrange(field.p) for _ in range(n)]
    a = ops.encode(coeffs)
    single = ops.decode(jax.jit(lambda x: intt(ops, x))(a))
    stepped = ops.decode(jax.jit(lambda x: four_step_intt(ops, x, mesh8))(a))
    assert list(single) == list(stepped)


def test_sharded_icoset_ntt_matches_single(mesh8):
    from hodor_tpu.ntt import icoset_ntt
    from hodor_tpu.parallel import sharded_icoset_ntt

    field = F257  # layout logic is field-independent; 1-limb compiles fast
    ops = ops_for(field)
    random.seed(15)
    n = 32
    vals = [random.randrange(field.p) for _ in range(n)]
    a = ops.encode(vals)
    single = ops.decode(jax.jit(lambda x: icoset_ntt(ops, x))(a))
    stepped = ops.decode(jax.jit(lambda x: sharded_icoset_ntt(ops, x, mesh8))(a))
    assert list(single) == list(stepped)


def test_sharded_coset_lde_rows_matches_single(mesh8):
    """The small-factor (factor < mesh) distributed coset-LDE used by
    ALI term evaluation: row-sharded four-step per coset."""
    from hodor_tpu.parallel import sharded_coset_lde_rows

    field = F257  # layout logic is field-independent; 1-limb compiles fast
    ops = ops_for(field)
    random.seed(16)
    t, factor = 32, 2
    coeffs = [[random.randrange(field.p) for _ in range(t)] for _ in range(3)]
    a = jax.numpy.stack([ops.encode(c) for c in coeffs])  # (3, T, L)
    single = jax.jit(lambda x: lde(ops, x, factor, coset=True))(a)
    sharded = jax.jit(
        lambda x: sharded_coset_lde_rows(ops, x, factor, mesh8)
    )(a)
    for b in range(3):
        assert list(ops.decode(single[b])) == list(ops.decode(sharded[b]))
