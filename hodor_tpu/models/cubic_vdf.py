"""Cubic VDF workload (reference: src/experiments/cubic_vdf.rs:13-265).

A cubing chain in Fp2 with r = -1, proven via an intermediate squaring
step: 4 registers (c0, c1, sq_c0, sq_c1) and 4 dense degree-2
constraints:

    sq_c0 = c0^2 + r*c1^2
    sq_c1 = 2*c0*c1
    c0'   = c0*sq_c0 + r*c1*sq_c1
    c1'   = c0*sq_c1 + c1*sq_c0
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..air.constraint import (
    BoundaryConstraint,
    Constraint,
    DenseConstraint,
    PolyvariateTerm,
    Register,
    StepDifference,
    UnivariateTerm,
)
from ..arp import InstanceProperties
from ..field.field import Field


class CubicVDF:
    def __init__(self, field: Field, start_c0: int, start_c1: int, num_operations: int):
        self.field = field
        self.start_c0 = start_c0 % field.p
        self.start_c1 = start_c1 % field.p
        self.num_operations = num_operations

    def into_arp(self) -> Tuple[Optional[List[List[int]]], InstanceProperties]:
        field = self.field
        p = field.p
        r = p - 1  # non-residue -1

        c0_reg = Register.Register(0)
        c1_reg = Register.Register(1)
        sq0_reg = Register.Register(2)
        sq1_reg = Register.Register(3)

        def now(reg, power=1, coeff=1):
            return UnivariateTerm(coeff, reg, StepDifference.Steps(0), power)

        def nxt(reg):
            return UnivariateTerm(1, reg, StepDifference.Steps(1), 1)

        # sq_c0 = c0^2 + r*c1^2
        c0_c = Constraint(density=DenseConstraint())
        c0_c -= now(c0_reg, power=2)
        c0_c -= now(c1_reg, power=2, coeff=r)
        c0_c += now(sq0_reg)

        # sq_c1 = 2*c0*c1
        c1_c = Constraint(density=DenseConstraint())
        c1_c -= PolyvariateTerm(coeff=2, terms=[now(c0_reg), now(c1_reg)], total_degree=2)
        c1_c += now(sq1_reg)

        # c0' = c0*sq_c0 + r*c1*sq_c1
        c2_c = Constraint(density=DenseConstraint())
        c2_c -= PolyvariateTerm(coeff=1, terms=[now(c0_reg), now(sq0_reg)], total_degree=2)
        c2_c -= PolyvariateTerm(coeff=r, terms=[now(c1_reg), now(sq1_reg)], total_degree=2)
        c2_c += nxt(c0_reg)

        # c1' = c0*sq_c1 + c1*sq_c0
        c3_c = Constraint(density=DenseConstraint())
        c3_c -= PolyvariateTerm(coeff=1, terms=[now(c0_reg), now(sq1_reg)], total_degree=2)
        c3_c -= PolyvariateTerm(coeff=1, terms=[now(c1_reg), now(sq0_reg)], total_degree=2)
        c3_c += nxt(c1_reg)

        def square(a, b):
            return (a * a + r * b * b) % p, 2 * a * b % p

        def mul(a, b, c, d):
            # (a, b) * (c, d) = (a*c + r*b*d, a*d + b*c)
            return (a * c + r * b * d) % p, (a * d + b * c) % p

        num_values = self.num_operations + 1
        witness, final_c0, final_c1 = self._witness(square, mul)

        boundary = [
            BoundaryConstraint(c0_reg, 0, self.start_c0),
            BoundaryConstraint(c1_reg, 0, self.start_c1),
            BoundaryConstraint(c0_reg, self.num_operations, final_c0),
            BoundaryConstraint(c1_reg, self.num_operations, final_c1),
        ]

        props = InstanceProperties(
            num_rows=num_values,
            num_registers=4,
            constraints=[c0_c, c1_c, c2_c, c3_c],
            boundary_constraints=boundary,
            field=field,
        )
        return witness, props

    _NATIVE_MIN_OPS = 1 << 12

    def _witness(self, square, mul):
        """(witness, final_c0, final_c1); native C++ chain for large
        instances (native/vdf_witness.cpp), Python otherwise."""
        import os

        import numpy as np

        use_native = os.environ.get("HODOR_NATIVE_WITNESS", "auto")
        if use_native != "0" and (
            use_native == "1" or self.num_operations >= self._NATIVE_MIN_OPS
        ):
            from ..utils.native import cubic_vdf_witness_native, u64_rows_to_ints

            res = cubic_vdf_witness_native(
                self.field, self.start_c0, self.start_c1, self.num_operations
            )
            if res is not None:
                c0_w, c1_w, sq0_w, sq1_w = res
                (final_c0,) = u64_rows_to_ints(c0_w[-1:])
                (final_c1,) = u64_rows_to_ints(c1_w[-1:])
                return np.stack([c0_w, c1_w, sq0_w, sq1_w]), final_c0, final_c1

        num_values = self.num_operations + 1
        c0_w = [0] * num_values
        c1_w = [0] * num_values
        sq0_w = [0] * num_values
        sq1_w = [0] * num_values
        v0, v1 = self.start_c0, self.start_c1
        c0_w[0], c1_w[0] = v0, v1
        s0, s1 = square(v0, v1)
        sq0_w[0], sq1_w[0] = s0, s1
        for i in range(self.num_operations):
            v0, v1 = mul(s0, s1, v0, v1)
            c0_w[i + 1], c1_w[i + 1] = v0, v1
            s0, s1 = square(v0, v1)
            sq0_w[i + 1], sq1_w[i + 1] = s0, s1
        return [c0_w, c1_w, sq0_w, sq1_w], c0_w[-1], c1_w[-1]
