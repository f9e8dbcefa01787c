"""Polynomial abstraction (reference: src/polynomials/mod.rs).

The reference encodes the coefficient/value duality at the type level
(`Polynomial<F, Coefficients|Values>`, src/polynomials/mod.rs:14-34).
Here `Polynomial` is a thin host wrapper over a (N, L) Montgomery limb
device array plus its form tag; every method delegates to the batched
ntt/limb kernels, so wrapping costs nothing inside jit. The protocol
layers (arp/ali/fri) work on raw arrays for fusion; this class is the
user-facing algebra API with the reference's method surface.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterable, List, Union

import jax
import jax.numpy as jnp

from ..domain import Domain, next_power_of_two
from ..errors import SynthesisError
from ..field.field import Field
from ..field.limbs import LimbOps, ops_for
from ..ntt import (
    coset_ntt,
    distribute_powers,
    evaluate_at,
    icoset_ntt,
    intt,
    lde as lde_fn,
    ntt,
)

COEFFICIENTS = "coefficients"
VALUES = "values"


@dataclasses.dataclass
class Polynomial:
    """A polynomial in coefficient or value form over a 2^k domain."""

    data: jnp.ndarray  # (N, L) Montgomery limbs
    form: str
    field: Field

    # ---- constructors (from_coeffs/from_values pad to a power of two,
    #      src/polynomials/mod.rs:146-166, 722-742) ----

    @staticmethod
    def from_coeffs(field: Field, coeffs: Union[Iterable[int], jnp.ndarray]) -> "Polynomial":
        return Polynomial(_encode_padded(field, coeffs), COEFFICIENTS, field)

    @staticmethod
    def from_values(field: Field, values: Union[Iterable[int], jnp.ndarray]) -> "Polynomial":
        return Polynomial(_encode_padded(field, values), VALUES, field)

    @staticmethod
    def from_roots(field: Field, roots: List[int]) -> "Polynomial":
        """Product tree prod(X - r_i) (src/polynomials/mod.rs:168-227).

        The reference builds the tree with one rayon task per subtree;
        here each tree LEVEL is one batched device program: the K
        degree-M factor polynomials multiply pairwise via batched
        (NTT -> pointwise mul -> iNTT) over a (K, 2M, L) array, so the
        whole level rides the batched NTT kernels. O(n log^2 n) total.
        """
        ops = ops_for(field)
        if not roots:
            return Polynomial.from_coeffs(field, [1])
        k = next_power_of_two(len(roots))
        # leaves (k, 2, L): (X - r) for real roots, constant 1 as filler
        leaf_ints = [[(-r) % field.p, 1] for r in roots] + [[1, 0]] * (
            k - len(roots)
        )
        cur = ops.encode(leaf_ints)
        while cur.shape[0] > 1:
            cur = _product_tree_level(ops, cur)
        out_len = next_power_of_two(len(roots) + 1)
        return Polynomial(cur[0, :out_len], COEFFICIENTS, field)

    # ---- basic properties ----

    @property
    def size(self) -> int:
        return int(self.data.shape[0])

    @property
    def domain(self) -> Domain:
        return Domain.new_for_size(self.field, self.size)

    @property
    def ops(self) -> LimbOps:
        return ops_for(self.field)

    def as_ints(self):
        """Decode to canonical Python ints (host)."""
        return [int(v) for v in self.ops.decode(self.data)]

    # ---- transforms (src/polynomials/mod.rs:611-638, 773-815) ----

    def fft(self) -> "Polynomial":
        assert self.form == COEFFICIENTS
        return Polynomial(ntt(self.ops, self.data), VALUES, self.field)

    def ifft(self) -> "Polynomial":
        assert self.form == VALUES
        return Polynomial(intt(self.ops, self.data), COEFFICIENTS, self.field)

    def coset_fft(self) -> "Polynomial":
        assert self.form == COEFFICIENTS
        return Polynomial(coset_ntt(self.ops, self.data), VALUES, self.field)

    def icoset_fft(self) -> "Polynomial":
        assert self.form == VALUES
        return Polynomial(icoset_ntt(self.ops, self.data), COEFFICIENTS, self.field)

    def lde(self, factor: int) -> "Polynomial":
        """LDE via factor-many coset NTTs (src/polynomials/mod.rs:418-482)."""
        assert self.form == COEFFICIENTS
        return Polynomial(lde_fn(self.ops, self.data, factor), VALUES, self.field)

    def coset_lde(self, factor: int) -> "Polynomial":
        assert self.form == COEFFICIENTS
        return Polynomial(lde_fn(self.ops, self.data, factor, coset=True), VALUES, self.field)

    # ---- elementwise algebra (src/polynomials/mod.rs:54-135, 744-887) ----

    def _check(self, other: "Polynomial"):
        assert self.form == other.form and self.size == other.size

    def add(self, other: "Polynomial") -> "Polynomial":
        self._check(other)
        return Polynomial(self.ops.add(self.data, other.data), self.form, self.field)

    def sub(self, other: "Polynomial") -> "Polynomial":
        self._check(other)
        return Polynomial(self.ops.sub(self.data, other.data), self.form, self.field)

    def mul(self, other: "Polynomial") -> "Polynomial":
        """Pointwise product (value form only, like the reference)."""
        assert self.form == VALUES
        self._check(other)
        return Polynomial(self.ops.mul(self.data, other.data), self.form, self.field)

    def add_assign_scaled(self, other: "Polynomial", scale: int) -> "Polynomial":
        self._check(other)
        ops = self.ops
        return Polynomial(
            ops.add(self.data, ops.mul(other.data, ops.const(scale % self.field.p))),
            self.form,
            self.field,
        )

    def scale(self, c: int) -> "Polynomial":
        return Polynomial(
            self.ops.mul(self.data, self.ops.const(c % self.field.p)), self.form, self.field
        )

    def negate(self) -> "Polynomial":
        return Polynomial(self.ops.neg(self.data), self.form, self.field)

    def add_constant(self, c: int) -> "Polynomial":
        ops = self.ops
        return Polynomial(
            ops.add(self.data, jnp.broadcast_to(ops.const(c % self.field.p), self.data.shape)),
            self.form,
            self.field,
        )

    def pow(self, e: int) -> "Polynomial":
        assert self.form == VALUES
        return Polynomial(self.ops.pow_static(self.data, e), self.form, self.field)

    def square(self) -> "Polynomial":
        return Polynomial(self.ops.square(self.data), self.form, self.field)

    def distribute_powers(self, g: int) -> "Polynomial":
        return Polynomial(
            distribute_powers(self.ops, self.data, self.ops.const(g % self.field.p)),
            self.form,
            self.field,
        )

    def batch_inversion(self) -> "Polynomial":
        """src/polynomials/mod.rs:889-954; raises on zero elements."""
        self.ops.assert_nonzero(self.data)
        return Polynomial(self.ops.batch_inverse(self.data), self.form, self.field)

    def evaluate_at(self, x: int) -> int:
        assert self.form == COEFFICIENTS
        out = evaluate_at(self.ops, self.data, self.ops.const(x % self.field.p))
        return int(self.ops.decode(out))


@partial(jax.jit, static_argnums=0)
def _product_tree_level(ops: LimbOps, polys):
    """One product-tree level: (K, M, L) coefficient polys (degree < M)
    -> (K/2, 2M, L) pairwise products, all batched through the NTT."""
    k, m, L = polys.shape
    padded = jnp.concatenate(
        [polys, jnp.zeros((k, m, L), polys.dtype)], axis=1
    )  # degree < 2M-1 fits the 2M-point domain
    vals = ntt(ops, padded)
    prod = ops.mul(vals[0::2], vals[1::2])
    return intt(ops, prod)


def _encode_padded(field: Field, data) -> jnp.ndarray:
    if isinstance(data, (jnp.ndarray,)):
        return data
    data = list(data)
    n = next_power_of_two(len(data))
    data = [int(v) % field.p for v in data] + [0] * (n - len(data))
    return ops_for(field).encode(data)
