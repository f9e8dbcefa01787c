"""NTT / LDE / polynomial-kernel equivalence tests.

Ports the reference's cross-implementation equivalence strategy:
FFT round trip (src/fft/mod.rs:280-328), test_lde_correctness
(src/polynomials/mod.rs:987-1032) and the coset variant (:1035-1081),
checked against a naive O(N^2) Python-int DFT oracle.
"""

import random

import jax
import pytest

from hodor_tpu.domain import Domain
from hodor_tpu.field import F257, F_STARK, ops_for
from hodor_tpu.ntt import (
    coset_ntt,
    distribute_powers,
    evaluate_at,
    evaluate_at_domain_for_degree_one,
    icoset_ntt,
    intt,
    lde,
    ntt,
)


def naive_dft(field, coeffs, gen, shift=1):
    n = len(coeffs)
    return [
        sum(c * pow(shift * pow(gen, k, field.p) % field.p, j, field.p) for j, c in enumerate(coeffs))
        % field.p
        for k in range(n)
    ]


@pytest.mark.parametrize("field", [F257, F_STARK], ids=lambda f: f.name)
def test_ntt_vs_naive_and_roundtrip(field):
    random.seed(1)
    n = 16
    ops = ops_for(field)
    dom = Domain.new_for_size(field, n)
    coeffs = [random.randrange(field.p) for _ in range(n)]
    a = ops.encode(coeffs)
    vals = ops.decode(jax.jit(lambda x: ntt(ops, x))(a))
    expect = naive_dft(field, coeffs, dom.generator)
    assert [int(v) for v in vals] == expect
    back = ops.decode(jax.jit(lambda x: intt(ops, ntt(ops, x)))(a))
    assert [int(v) for v in back] == coeffs


@pytest.mark.parametrize("field", [F257], ids=lambda f: f.name)
def test_coset_ntt_roundtrip(field):
    random.seed(2)
    n = 32
    ops = ops_for(field)
    coeffs = [random.randrange(field.p) for _ in range(n)]
    a = ops.encode(coeffs)
    vals = ops.decode(jax.jit(lambda x: coset_ntt(ops, x))(a))
    dom = Domain.new_for_size(field, n)
    expect = naive_dft(field, coeffs, dom.generator, shift=field.generator)
    assert [int(v) for v in vals] == expect
    back = ops.decode(jax.jit(lambda x: icoset_ntt(ops, coset_ntt(ops, x)))(a))
    assert [int(v) for v in back] == coeffs


@pytest.mark.parametrize("coset", [False, True])
def test_lde_multiple_cosets_vs_naive(coset):
    # port of test_lde_correctness / test_coset_lde_correctness
    field = F257
    random.seed(3)
    n, factor = 8, 4
    ops = ops_for(field)
    coeffs = [random.randrange(field.p) for _ in range(n)]
    big = Domain.new_for_size(field, n * factor)
    out = ops.decode(jax.jit(lambda x: lde(ops, x, factor, coset=coset))(ops.encode(coeffs)))
    shift = field.generator if coset else 1
    expect = naive_dft(field, coeffs + [0] * (n * factor - n), big.generator, shift=shift)
    assert [int(v) for v in out] == expect


def test_lde_batched_matches_single():
    field = F257
    random.seed(4)
    ops = ops_for(field)
    rows = [[random.randrange(field.p) for _ in range(8)] for _ in range(3)]
    batched = ops.decode(jax.jit(lambda x: lde(ops, x, 4))(ops.encode(rows)))
    for r, row in enumerate(rows):
        single = ops.decode(lde(ops, ops.encode(row), 4))
        assert [int(v) for v in batched[r]] == [int(v) for v in single]


def test_evaluate_at():
    field = F_STARK
    random.seed(5)
    ops = ops_for(field)
    coeffs = [random.randrange(field.p) for _ in range(16)]
    x = random.randrange(field.p)
    got = ops.decode(jax.jit(lambda c, xx: evaluate_at(ops, c, xx))(ops.encode(coeffs), ops.const(x)))
    assert int(got) == sum(c * pow(x, j, field.p) for j, c in enumerate(coeffs)) % field.p


def test_degree_one_eval_and_distribute():
    field = F257
    ops = ops_for(field)
    dom = Domain.new_for_size(field, 16)
    c0, c1 = 5, 7
    vals = ops.decode(
        evaluate_at_domain_for_degree_one(ops, ops.const(c0), ops.const(c1), 16, coset=True)
    )
    for i in range(16):
        x = field.generator * pow(dom.generator, i, field.p) % field.p
        assert int(vals[i]) == (c0 + c1 * x) % field.p
    a = ops.encode(list(range(1, 17)))
    dp = ops.decode(distribute_powers(ops, a, ops.const(3)))
    for i in range(16):
        assert int(dp[i]) == (i + 1) * pow(3, i, field.p) % field.p


def test_matmul_vs_pease_equivalence_f_bls():
    """F_BLS's 255-bit modulus caps max_radix at 4 (128*p^2 overflows
    the 2n-limb intermediate), so the matmul NTT runs radix-4 levels -
    a dispatch branch no other field reaches. It must agree bit-exactly
    with the constant-geometry Pease schedule (VERDICT round-1 item 4)."""
    from hodor_tpu.field import F_BLS
    from hodor_tpu.ntt import _ntt_pease
    from hodor_tpu.ntt.matmul import max_radix, ntt_matmul

    assert max_radix(F_BLS) == 4
    random.seed(61)
    field = F_BLS
    ops = ops_for(field)
    n = 512
    a = ops.encode([random.randrange(field.p) for _ in range(n)])
    import numpy as np

    pease = np.asarray(_ntt_pease(ops, a, 9, False))
    mat = np.asarray(ntt_matmul(ops, a))
    assert (pease == mat).all()
    pease_inv = np.asarray(_ntt_pease(ops, a, 9, True))
    mat_inv = np.asarray(ntt_matmul(ops, a, inverse=True))
    assert (pease_inv == mat_inv).all()


def test_matmul_split_twiddle_path(monkeypatch):
    """Above _TW_LITERAL_MAX elements the top-level recombination
    twiddles are built in-graph from two strided factors instead of one
    giant XLA literal (1 GiB at 2^24). Force the split at a small size
    and check bit-exactness against the literal path."""
    from hodor_tpu.ntt import matmul as mm

    random.seed(62)
    field = F_STARK
    ops = ops_for(field)
    n = 1 << 9
    a = ops.encode([random.randrange(field.p) for _ in range(n)])
    import numpy as np

    ref = np.asarray(mm.ntt_matmul(ops, a))
    ref_inv = np.asarray(mm.ntt_matmul(ops, a, inverse=True))
    monkeypatch.setattr(mm, "_TW_LITERAL_MAX", 16)
    jax.clear_caches()
    assert (np.asarray(mm.ntt_matmul(ops, a)) == ref).all()
    assert (np.asarray(mm.ntt_matmul(ops, a, inverse=True)) == ref_inv).all()
    monkeypatch.undo()
    jax.clear_caches()


def test_lde_sequential_path_matches_batched(monkeypatch):
    """The memory-bounded sequential (lax.map) coset walk in lde() must
    be bit-identical to the batched form (it only engages above
    _LDE_SEQUENTIAL_MIN elements, beyond any test shape - force it)."""
    import numpy as np

    import hodor_tpu.ntt as nttmod

    random.seed(63)
    field = F257  # path selection is field-independent; 1-limb compiles fast
    ops = ops_for(field)
    coeffs = ops.encode([random.randrange(field.p) for _ in range(32)])  # 32*8 = 256 = F257's max domain
    for coset in (False, True):
        ref = np.asarray(nttmod.lde(ops, coeffs, 8, coset=coset))
        monkeypatch.setattr(nttmod, "_LDE_SEQUENTIAL_MIN", 1)
        jax.clear_caches()
        seq = np.asarray(nttmod.lde(ops, coeffs, 8, coset=coset))
        monkeypatch.undo()
        jax.clear_caches()
        assert (ref == seq).all()

def test_interleave_chunked_path_matches_direct(monkeypatch):
    """The row-chunked LDE interleave (engages above _INTERLEAVE_CHUNK_MIN
    elements — the direct transpose's 8x tile padding OOM'd the 2^20-row
    prove, see ntt._interleave) must be bit-identical to the direct
    swapaxes form, including with leading batch dims."""
    import numpy as np

    import hodor_tpu.ntt as nttmod

    random.seed(64)
    field = F257
    ops = ops_for(field)
    for lead in ((), (3,)):
        shape = lead + (32,)
        vals = [random.randrange(field.p) for _ in range(int(np.prod(shape)))]
        coeffs = ops.encode(np.array(vals).reshape(shape))
        ref = np.asarray(nttmod.lde(ops, coeffs, 8, coset=True))
        monkeypatch.setattr(nttmod, "_INTERLEAVE_CHUNK_MIN", 1)
        monkeypatch.setattr(nttmod, "_INTERLEAVE_ROWS", 8)
        jax.clear_caches()
        chunked = np.asarray(nttmod.lde(ops, coeffs, 8, coset=True))
        monkeypatch.undo()
        jax.clear_caches()
        assert (ref == chunked).all()


def test_omega_table_device_matches_host():
    """omega_table_device (device log-doubling powers; replaces the
    >=256 MB host literal upload that killed the axon backend) must
    reproduce the host-cached _omega_table bit-exactly."""
    import numpy as np

    from hodor_tpu.ntt import _omega_table, omega_table_device

    for field in (F257, F_STARK):
        for inverse in (False, True):
            host = np.asarray(_omega_table(field, 5, inverse))
            dev = np.asarray(omega_table_device(field, 5, inverse))
            assert (host == dev).all()
