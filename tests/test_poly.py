"""Polynomial wrapper API tests (reference: src/polynomials/mod.rs)."""

import random

import pytest

from hodor_tpu.errors import DivisionByZeroError
from hodor_tpu.field import F257
from hodor_tpu.poly import Polynomial


def test_fft_roundtrip_and_coset():
    random.seed(51)
    coeffs = [random.randrange(257) for _ in range(16)]
    p = Polynomial.from_coeffs(F257, coeffs)
    assert p.fft().ifft().as_ints() == coeffs
    assert p.coset_fft().icoset_fft().as_ints() == coeffs


def test_lde_matches_fft_of_padded():
    random.seed(52)
    coeffs = [random.randrange(257) for _ in range(8)]
    p = Polynomial.from_coeffs(F257, coeffs)
    wide = Polynomial.from_coeffs(F257, coeffs + [0] * 24)
    assert p.lde(4).as_ints() == wide.fft().as_ints()


def test_from_roots():
    roots = [3, 7, 11]
    p = Polynomial.from_roots(F257, roots)
    for r in roots:
        assert p.evaluate_at(r) == 0
    assert p.evaluate_at(5) != 0


def test_elementwise_algebra():
    random.seed(53)
    a_ints = [random.randrange(257) for _ in range(8)]
    b_ints = [random.randrange(257) for _ in range(8)]
    a = Polynomial.from_values(F257, a_ints)
    b = Polynomial.from_values(F257, b_ints)
    assert a.mul(b).as_ints() == [x * y % 257 for x, y in zip(a_ints, b_ints)]
    assert a.add(b).as_ints() == [(x + y) % 257 for x, y in zip(a_ints, b_ints)]
    assert a.scale(5).as_ints() == [x * 5 % 257 for x in a_ints]
    assert a.pow(3).as_ints() == [pow(x, 3, 257) for x in a_ints]
    assert a.add_constant(9).as_ints() == [(x + 9) % 257 for x in a_ints]
    assert a.add_assign_scaled(b, 7).as_ints() == [
        (x + 7 * y) % 257 for x, y in zip(a_ints, b_ints)
    ]


def test_batch_inversion_and_zero_rejection():
    vals = [1, 2, 3, 4]
    p = Polynomial.from_values(F257, vals)
    inv = p.batch_inversion().as_ints()
    assert all(v * i % 257 == 1 for v, i in zip(vals, inv))
    with pytest.raises(DivisionByZeroError):
        Polynomial.from_values(F257, [1, 0, 3, 4]).batch_inversion()


def test_distribute_powers():
    vals = [1] * 8
    p = Polynomial.from_coeffs(F257, vals)
    assert p.distribute_powers(3).as_ints() == [pow(3, i, 257) for i in range(8)]


def test_from_roots_product_tree_large():
    """Device product tree at depth (120 roots): evaluates to
    zero at every root and matches a scalar Horner elsewhere."""
    import random

    random.seed(71)
    p = F257.p  # tree depth is what's under test; 1-limb compiles fast
    roots = [random.randrange(p) for _ in range(120)]
    poly = Polynomial.from_roots(F257, roots)
    assert poly.size == 128  # next_power_of_two(121)
    for r in random.sample(roots, 5):
        assert poly.evaluate_at(r) == 0
    # spot-check a non-root against direct product evaluation
    x = 123456789
    expect = 1
    for r in roots:
        expect = expect * (x - r) % p
    assert poly.evaluate_at(x) == expect
