"""Dense-density coverage: start_at > 0 and span > 1 end-to-end.

Exercises the divisor machinery off the (0, 1) defaults on both sides:
the ALI batch divisors (hodor_tpu/ali/instance.py density_roots) and the
verifier's scalar divisor (verifier.py
_inverse_divisor_for_dense_constraint), mirroring the reference's dense
row iterator semantics (src/arp/density_query.rs: rows
[start_at, num_rows - span)).
"""

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
from hodor_tpu.errors import TracingError, UnsatisfiedError
from hodor_tpu.field import F257, F_STARK
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

T_ROWS = 8


def _instance(field=F257):
    """reg0: a[i+1] = a[i]^2 + 1 on rows [1, 7) (start_at=1 - row 0 is
    deliberately NOT constrained); reg1: b[i+2] = b[i+1]*b[i] on rows
    [0, 6) (span=2)."""
    p = field.p
    r0, r1 = Register.Register(0), Register.Register(1)

    a_now = UnivariateTerm(1, r0, StepDifference.Steps(0), 1)
    a_next = UnivariateTerm(1, r0, StepDifference.Steps(1), 1)
    c0 = Constraint(density=DenseConstraint(start_at=1, span=1))
    c0 += a_next
    c0 -= a_now.pow(2)
    c0 -= 1

    b_nn = UnivariateTerm(1, r1, StepDifference.Steps(2), 1)
    prod = PolyvariateTerm(coeff=1, terms=[
        UnivariateTerm(1, r1, StepDifference.Steps(1), 1),
        UnivariateTerm(1, r1, StepDifference.Steps(0), 1),
    ], total_degree=2)
    c1 = Constraint(density=DenseConstraint(start_at=0, span=2))
    c1 += b_nn
    c1 -= prod

    a = [5, 3] + [0] * (T_ROWS - 2)  # a[0]=5 breaks the rule; allowed
    for i in range(1, T_ROWS - 1):
        a[i + 1] = (a[i] * a[i] + 1) % p
    b = [1, 2] + [0] * (T_ROWS - 2)
    for i in range(T_ROWS - 2):
        b[i + 2] = b[i + 1] * b[i] % p

    boundary = [
        BoundaryConstraint(r0, 1, a[1]),
        BoundaryConstraint(r1, 0, b[0]),
        BoundaryConstraint(r1, 1, b[1]),
    ]
    props = InstanceProperties(
        num_rows=T_ROWS,
        num_registers=2,
        constraints=[c0, c1],
        boundary_constraints=boundary,
        field=field,
    )
    return [a, b], props


def test_density_witness_satisfied():
    witness, props = _instance()
    # row 0 violates the reg0 rule but start_at=1 excludes it
    assert (witness[0][1] != (witness[0][0] ** 2 + 1) % F257.p)
    ARPInstance.is_satisfied(props, witness)


def test_density_violation_inside_range_detected():
    witness, props = _instance()
    witness[0][4] = (witness[0][4] + 1) % F257.p
    with pytest.raises(UnsatisfiedError):
        ARPInstance.is_satisfied(props, witness)


def test_density_span_tail_rows_unconstrained():
    # rows 6, 7 of reg1 are outside [0, 6): changing b[7] never trips the
    # dense constraint (it IS referenced via b[5+2], so change is visible,
    # but row index 6 is excluded -> b[7] appears only in excluded rows)
    witness, props = _instance()
    witness[1][7] = 123
    with pytest.raises(UnsatisfiedError):
        # b[7] = b[6]*b[5] IS required at row 5 (5 < 6): must fail
        ARPInstance.is_satisfied(props, witness)
    # row 6's would-be constraint (b[8]) does not exist - no IndexError


def test_density_boundary_bounds_checked():
    witness, props = _instance()
    props.boundary_constraints.append(BoundaryConstraint(Register.Register(0), 99, 1))
    with pytest.raises(TracingError):
        ARPInstance.is_satisfied(props, witness)
    props.boundary_constraints[-1] = BoundaryConstraint(Register.Register(9), 0, 1)
    with pytest.raises(TracingError):
        ARPInstance.is_satisfied(props, witness)


@pytest.mark.slow
def test_density_prove_verify_roundtrip():
    # F_STARK: in a 257-element field mask*z falls inside the LDE domain
    # with probability n/256 and DEEP (correctly) refuses to divide
    witness, props = _instance(F_STARK)
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=8).verify(proof)


@pytest.mark.slow
def test_density_soundness():
    witness, props = _instance(F_STARK)
    witness[0][4] = (witness[0][4] + 1) % F_STARK.p
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert not Verifier(props, lde_factor=8).verify(proof)
