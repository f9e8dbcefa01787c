"""Tensor-LDE query tests (reference src/experiments/tensor_lde.rs tests)."""

from hodor_tpu.domain import Domain
from hodor_tpu.field import F257
from hodor_tpu.models.tensor_lde import (
    decompose_lde_generator_for_vector_over_vector,
    materialize_factor,
    query_matrix_over_identity,
    query_vector_over_vector,
)


def test_vector_over_vector_kron():
    f = F257
    a = ([2, 3], 2)
    b = ([5, 7, 11], 3)
    # full = kron layout: full[idx] = a[idx % 2] * b[idx // 2]
    full = [a[0][i % 2] * b[0][i // 2] % f.p for i in range(6)]
    for i in range(6):
        assert query_vector_over_vector(f, a, b, i) == full[i]


def test_matrix_over_identity_blocks():
    f = F257
    sub = ([1, 2, 3, 4], (2, 2))
    # 4x4 block diagonal with two copies of sub
    for r in range(4):
        for c in range(4):
            v = query_matrix_over_identity(f, sub, (r, c))
            if r // 2 == c // 2:
                assert v == sub[0][2 * (r % 2) + (c % 2)]
            else:
                assert v == 0


def test_lde_generator_decomposition():
    f = F257
    lde_factor, t = 4, 16
    n = lde_factor * t
    dom = Domain.new_for_size(f, n)
    g = f.generator
    f1, f2 = decompose_lde_generator_for_vector_over_vector(
        f, lde_factor, t, (8, 8), dom.generator, g
    )
    v1 = materialize_factor(f, f1)
    v2 = materialize_factor(f, f2)
    for idx in range(n):
        expect = g * f.pow(dom.generator, idx) % f.p
        assert query_vector_over_vector(f, v1, v2, idx) == expect
