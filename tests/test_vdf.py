"""VDF workload round trips over the benchmark field.

Small-T versions of the reference's benchmark tests
(try_prove_quadratic_vdf, src/experiments/vdf.rs:133-220 and
try_prove_cubic_vdf, src/experiments/cubic_vdf.rs:268+), proving over
the 2^251+17*2^192+1 prime with lde_factor 16 and verifying.
"""

import pytest

from hodor_tpu.arp import ARPInstance
from hodor_tpu.field import F_STARK
from hodor_tpu.models import VDF, CubicVDF
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


def test_quadratic_vdf_witness_satisfies():
    witness, props = VDF(F_STARK, 1, 2, 7).into_arp()
    ARPInstance.is_satisfied(props, witness)
    assert props.num_registers == 2 and len(props.constraints) == 2


def test_cubic_vdf_witness_satisfies():
    witness, props = CubicVDF(F_STARK, 1, 2, 7).into_arp()
    ARPInstance.is_satisfied(props, witness)
    assert props.num_registers == 4 and len(props.constraints) == 4


@pytest.mark.slow
def test_quadratic_vdf_prove_verify():
    witness, props = VDF(F_STARK, 1, 2, 7).into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    verifier = Verifier(props, lde_factor=16)
    assert verifier.verify(proof)
    # soundness: corrupt one witness value
    witness[0][1] = (witness[0][1] + 1) % F_STARK.p
    bad_proof = prover.prove(witness)
    assert not verifier.verify(bad_proof)


@pytest.mark.slow
def test_cubic_vdf_prove_verify():
    witness, props = CubicVDF(F_STARK, 1, 2, 7).into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=16).verify(proof)
