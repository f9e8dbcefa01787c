"""Multi-register (R=6) instance end-to-end (VERDICT round-1 weak item
6: nothing above R=4 was ever exercised). Six registers with mixed
degree-1/degree-2 cross-register constraints, full prove+verify."""

import pytest

from hodor_tpu.air.constraint import (
    BoundaryConstraint,
    Constraint,
    DenseConstraint,
    PolyvariateTerm,
    Register,
    StepDifference,
    UnivariateTerm,
)
from hodor_tpu.arp import ARPInstance, InstanceProperties
from hodor_tpu.field import F_STARK
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

T = 8
R = 6


def _instance():
    p = F_STARK.p
    regs = [Register.Register(i) for i in range(R)]

    def now(r, power=1, coeff=1):
        return UnivariateTerm(coeff, regs[r], StepDifference.Steps(0), power)

    def nxt(r):
        return UnivariateTerm(1, regs[r], StepDifference.Steps(1), 1)

    constraints = []
    # reg0: a0[i+1] = a0[i] + 1         (degree 1)
    c = Constraint(density=DenseConstraint())
    c += nxt(0)
    c -= now(0)
    c -= 1
    constraints.append(c)
    # regs 1..5: a_r[i+1] = a_r[i] * a_{r-1}[i]   (degree 2, cross-reg)
    for r in range(1, R):
        c = Constraint(density=DenseConstraint())
        c += nxt(r)
        c -= PolyvariateTerm(coeff=1, terms=[now(r), now(r - 1)], total_degree=2)
        constraints.append(c)

    cols = [[0] * T for _ in range(R)]
    cols[0][0] = 2
    for r in range(1, R):
        cols[r][0] = r + 1
    for i in range(T - 1):
        cols[0][i + 1] = (cols[0][i] + 1) % p
        for r in range(1, R):
            cols[r][i + 1] = cols[r][i] * cols[r - 1][i] % p

    boundary = [BoundaryConstraint(regs[r], 0, cols[r][0]) for r in range(R)] + [
        BoundaryConstraint(regs[R - 1], T - 1, cols[R - 1][-1])
    ]
    props = InstanceProperties(
        num_rows=T,
        num_registers=R,
        constraints=constraints,
        boundary_constraints=boundary,
        field=F_STARK,
    )
    return cols, props


def test_six_register_satisfied():
    witness, props = _instance()
    ARPInstance.is_satisfied(props, witness)


@pytest.mark.slow
def test_six_register_prove_verify():
    witness, props = _instance()
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert len(proof.f_queries) == R
    assert Verifier(props, lde_factor=8).verify(proof)


@pytest.mark.slow
def test_six_register_soundness():
    witness, props = _instance()
    witness[3][4] = (witness[3][4] + 1) % F_STARK.p
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert not Verifier(props, lde_factor=8).verify(proof)
