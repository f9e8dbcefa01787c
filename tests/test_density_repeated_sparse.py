"""Repeated/Sparse constraint densities, implemented beyond the
reference (which declares them at src/air/mod.rs:29-57 but
`unimplemented!()`s every downstream use: src/arp/density_query.rs,
src/ali/per_register/mod.rs:177-191, src/verifier/mod.rs divisors).

Shared semantics live in hodor_tpu/air/density.py; these tests pin

  (1) the algebraic divisor identity  1/Z_D(x) * prod_{r active}(x - g^r) = 1
      for all three densities (ties active-row semantics to the
      closed-form divisor),
  (2) the ALI device divisor arrays against the scalar verifier-side
      evaluation at every coset point,
  (3) ARP satisfiability at exactly the active rows,
  (4) a full prove -> verify round trip + soundness negative (slow).
"""

import numpy as np
import pytest

import jax

from hodor_tpu.air.constraint import (
    BoundaryConstraint,
    Constraint,
    DenseConstraint,
    Register,
    RepeatedConstraint,
    SparseConstraint,
    StepDifference,
    UnivariateTerm,
)
from hodor_tpu.air.density import (
    density_active_rows,
    density_divisor_spec,
    density_key,
    inverse_divisor_at,
)
from hodor_tpu.arp import ARPInstance, InstanceProperties
from hodor_tpu.domain import Domain
from hodor_tpu.errors import UnsatisfiedError
from hodor_tpu.field import F257, F_STARK, ops_for
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

T_ROWS = 8


# ---------------------------------------------------------------- units

@pytest.mark.parametrize(
    "key,expected",
    [
        (("dense", 1, 1), [1, 2, 3, 4, 5, 6]),
        (("repeated", 0, 1, 2), [0, 2, 4, 6]),
        (("repeated", 1, 1, 2), [1, 3, 5]),
        (("repeated", 3, 2, 4), [3]),  # 7 >= num_rows - span
        (("sparse", (1, 4)), [1, 4]),
    ],
)
def test_active_rows(key, expected):
    assert density_active_rows(key, T_ROWS) == expected


@pytest.mark.parametrize(
    "key",
    [
        ("dense", 0, 1),
        ("dense", 2, 2),
        ("repeated", 0, 1, 2),
        ("repeated", 1, 1, 2),
        ("repeated", 5, 2, 4),  # start >= interval: residue-class rows below start excluded
        ("sparse", (1, 4, 6)),
    ],
)
def test_divisor_is_vanishing_poly_of_active_rows(key, field=F257):
    """1/Z_D(x) from the closed form times prod over the ACTIVE rows of
    (x - g^r) must be exactly 1 - for every density kind."""
    domain = Domain.new_for_size(field, T_ROWS)
    g, p = domain.generator, field.p
    rows = density_active_rows(key, T_ROWS)
    rng = np.random.default_rng(3)
    for _ in range(8):
        x = int(rng.integers(2, p))
        if any(x == field.pow(g, r) for r in range(domain.size)):
            continue  # x on the domain: divisor legitimately undefined
        inv = inverse_divisor_at(field, x, domain, key, T_ROWS)
        z = 1
        for r in rows:
            z = z * ((x - field.pow(g, r)) % p) % p
        assert inv * z % p == 1, (key, x)


def test_repeated_interval_must_divide_domain():
    with pytest.raises(ValueError):
        density_divisor_spec(("repeated", 0, 1, 3), T_ROWS, T_ROWS)


def test_sparse_rows_validated():
    with pytest.raises(ValueError):
        density_divisor_spec(("sparse", ()), T_ROWS, T_ROWS)
    with pytest.raises(ValueError):
        density_divisor_spec(("sparse", (9,)), T_ROWS, T_ROWS)
    with pytest.raises(ValueError):
        density_divisor_spec(("sparse", (1, 1)), T_ROWS, T_ROWS)


# ---------------------------------------------------- instance fixtures

def _instance(field=F257):
    """reg0: a[i+1] = a[i]^2 + 1 at EVEN rows only
    (Repeated(start=0, span=1, interval=2); odd rows free);
    reg1: b[i+1] = 3*b[i] at rows {1, 4} only (Sparse)."""
    p = field.p
    r0, r1 = Register.Register(0), Register.Register(1)

    a_now = UnivariateTerm(1, r0, StepDifference.Steps(0), 1)
    a_next = UnivariateTerm(1, r0, StepDifference.Steps(1), 1)
    c0 = Constraint(density=RepeatedConstraint(start_at=0, span=1, interval=2))
    c0 += a_next
    c0 -= a_now.pow(2)
    c0 -= 1

    b_now = UnivariateTerm(1, r1, StepDifference.Steps(0), 1)
    b_next = UnivariateTerm(1, r1, StepDifference.Steps(1), 1)
    c1 = Constraint(density=SparseConstraint(rows=(1, 4)))
    c1 += b_next
    c1 -= b_now.scaled(3)

    a = [3, 0, 7, 0, 2, 0, 9, 0]
    for i in (0, 2, 4, 6):
        a[i + 1] = (a[i] * a[i] + 1) % p
    # odd rows deliberately break the square rule
    a[2], a[4], a[6] = 7 % p, 2 % p, 9 % p
    b = [2, 5, 0, 7, 4, 0, 8, 6]
    b[2] = 3 * b[1] % p
    b[5] = 3 * b[4] % p

    boundary = [
        BoundaryConstraint(r0, 0, a[0]),
        BoundaryConstraint(r1, 0, b[0]),
    ]
    props = InstanceProperties(
        num_rows=T_ROWS,
        num_registers=2,
        constraints=[c0, c1],
        boundary_constraints=boundary,
        field=field,
    )
    return [a, b], props


# ------------------------------------------------------ satisfiability

def test_satisfied_at_exactly_active_rows():
    witness, props = _instance()
    # odd rows break the repeated rule; rows outside {1,4} break sparse
    assert witness[0][2] != (witness[0][1] ** 2 + 1) % F257.p
    assert witness[1][4] != 3 * witness[1][3] % F257.p
    ARPInstance.is_satisfied(props, witness)


def test_violation_at_active_row_detected():
    witness, props = _instance()
    witness[0][5] = (witness[0][5] + 1) % F257.p  # a[5] = a[4]^2+1 (row 4 active)
    with pytest.raises(UnsatisfiedError):
        ARPInstance.is_satisfied(props, witness)

    witness, props = _instance()
    witness[1][5] = (witness[1][5] + 1) % F257.p  # b[5] = 3*b[4] (sparse row 4)
    with pytest.raises(UnsatisfiedError):
        ARPInstance.is_satisfied(props, witness)


# ------------------------------------------- ALI device divisor arrays

def test_ali_device_divisors_match_scalar():
    from hodor_tpu.ali.instance import ALIInstance

    witness, props = _instance()
    arp = ARPInstance.from_instance(props.clone())
    ali = ALIInstance(arp)
    field = F257
    ops = ops_for(field)
    dom = ali.constraints_domain
    col = ali.column_domain
    for key, dev in ali.constraint_divisors.items():
        vals = ops.decode(dev)
        for i in range(0, dom.size, max(dom.size // 8, 1)):
            x = field.generator * field.pow(dom.generator, i) % field.p
            assert vals[i] == inverse_divisor_at(field, x, col, key, props.num_rows), (
                key, i)


# ------------------------------------------------------ e2e (slow)

@pytest.mark.slow
def test_repeated_sparse_prove_verify_roundtrip():
    witness, props = _instance(F_STARK)
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=8).verify(proof)


@pytest.mark.slow
def test_repeated_sparse_soundness():
    witness, props = _instance(F_STARK)
    witness[0][5] = (witness[0][5] + 1) % F_STARK.p
    prover = Prover(props.clone(), lde_factor=8, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert not Verifier(props, lde_factor=8).verify(proof)
