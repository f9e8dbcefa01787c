"""Fq2 arithmetic and square-root tests (reference:
src/experiments/square_root_calculator/fp2.rs tests)."""

import random

import pytest

from hodor_tpu.field import F_STARK
from hodor_tpu.models.fp2 import Fq2, sqrt_chain, tonelli_shanks


def test_tonelli_shanks():
    random.seed(21)
    p = F_STARK.p
    for _ in range(10):
        x = random.randrange(1, p)
        sq = x * x % p
        r = tonelli_shanks(F_STARK, sq)
        assert r is not None and r * r % p == sq


def test_fq2_field_axioms():
    random.seed(22)
    f = F_STARK
    a = Fq2.make(f, random.randrange(f.p), random.randrange(f.p))
    b = Fq2.make(f, random.randrange(f.p), random.randrange(f.p))
    # distributivity and inverse
    assert a.mul(b).sub(b.mul(a)).is_zero()
    assert a.mul(a.inverse()).sub(Fq2.one(f)).is_zero()
    # square == mul self, matching the VDF squaring map
    s = a.square()
    assert s.sub(a.mul(a)).is_zero()
    # norm is multiplicative
    assert a.mul(b).norm() == a.norm() * b.norm() % f.p


def test_fq2_sqrt_roundtrip():
    random.seed(23)
    f = F_STARK
    for _ in range(5):
        a = Fq2.make(f, random.randrange(f.p), random.randrange(f.p))
        sq = a.square()
        r = sq.sqrt()
        assert r is not None
        assert r.square().sub(sq).is_zero()


def test_sqrt_chain_inverts_vdf_squaring():
    # note: p = 1 mod 4, so u^2+1 splits and "Fq2" is the ring Fp x Fp
    # (exactly the reference's structure - its VDF non-residue is -1 with
    # a "TODO: check" comment, src/experiments/vdf.rs:35-37). Squares are
    # a quarter of the ring, so start from a known square.
    f = F_STARK
    start = Fq2.make(f, 12345, 6789).square()
    chain = sqrt_chain(f, (start.c0, start.c1), 1)
    # walking the chain backwards squares forward
    for (c0, c1), (n0, n1) in zip(chain, chain[1:]):
        sq = Fq2.make(f, n0, n1).square()
        assert (sq.c0, sq.c1) == (c0, c1)
