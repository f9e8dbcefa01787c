"""FRI equivalence and round-trip tests.

Ports the reference's cross-implementation pattern: by-values vs
by-coefficients FRI must agree on challenges, roots, and final
coefficients (test_fri_on_values_vs_on_coefficients, src/fri/mod.rs:509-691),
plus the prototype verifier sweep (test_one_fri_step, :251-361).
"""

import random

from hodor_tpu.domain import Domain
from hodor_tpu.field import F257, ops_for
from hodor_tpu.fri import NaiveFriIop
from hodor_tpu.ntt import lde


def _make_lde(field, log_t, lde_factor, seed):
    random.seed(seed)
    ops = ops_for(field)
    coeffs = [random.randrange(field.p) for _ in range(1 << log_t)]
    return lde(ops, ops.encode(coeffs), lde_factor)


def test_fri_values_vs_coefficients_equivalence():
    field = F257
    lde_values = _make_lde(field, 3, 8, seed=41)
    by_vals = NaiveFriIop.proof_from_lde_by_values(lde_values, 8, 1, field)
    by_coeffs = NaiveFriIop.proof_from_lde_through_coefficients(lde_values, 8, 1, field)
    assert by_vals.challenges == by_coeffs.challenges
    assert by_vals.get_roots() == by_coeffs.get_roots()
    assert by_vals.final_coefficients == by_coeffs.final_coefficients
    ops = ops_for(field)
    for a, b in zip(by_vals.intermediate_values, by_coeffs.intermediate_values):
        assert list(ops.decode(a)) == list(ops.decode(b))


def test_fri_prototype_verifier_sweep():
    # every odd index must verify against the prototype (reference sweeps
    # odd indices, src/fri/mod.rs:286-310)
    field = F257
    lde_values = _make_lde(field, 2, 4, seed=42)
    proto = NaiveFriIop.proof_from_lde_by_values(lde_values, 4, 1, field)
    for i in range(1, lde_values.shape[0], 2):
        assert NaiveFriIop.verify_prototype(proto, lde_values, i, field), i


def test_fri_query_proof_round_trip_and_rejection():
    field = F257
    lde_values = _make_lde(field, 3, 8, seed=43)
    ops = ops_for(field)
    proto = NaiveFriIop.proof_from_lde_by_values(lde_values, 8, 1, field)
    idx = 33
    proof = NaiveFriIop.prototype_into_proof(proto, lde_values, idx, field)
    expected = int(ops.decode(lde_values[idx]))
    assert NaiveFriIop.verify_proof(proof, idx, expected, field)
    # wrong expected value fails
    assert not NaiveFriIop.verify_proof(proof, idx, (expected + 1) % field.p, field)
    # tampered final coefficient fails
    proof.final_coefficients[0] = (proof.final_coefficients[0] + 1) % field.p
    assert not NaiveFriIop.verify_proof(proof, idx, expected, field)


def test_fri_higher_output_degree():
    """output_coeffs_at_degree_plus_one > 1: the ladder stops early and
    commits 4 final coefficients (reference supports any power of two,
    src/fri/fri_on_values.rs:27-37)."""
    field = F257
    ops = ops_for(field)
    lde_values = _make_lde(field, 3, 8, seed=44)
    by_vals = NaiveFriIop.proof_from_lde_by_values(lde_values, 8, 4, field)
    by_coeffs = NaiveFriIop.proof_from_lde_through_coefficients(lde_values, 8, 4, field)
    assert len(by_vals.final_coefficients) == 4
    assert by_vals.challenges == by_coeffs.challenges
    assert by_vals.get_roots() == by_coeffs.get_roots()
    assert by_vals.final_coefficients == by_coeffs.final_coefficients
    idx = 17
    proof = NaiveFriIop.prototype_into_proof(by_vals, lde_values, idx, field)
    expected = int(ops.decode(lde_values[idx]))
    assert NaiveFriIop.verify_proof(proof, idx, expected, field)
    assert not NaiveFriIop.verify_proof(proof, idx, (expected + 1) % field.p, field)


def test_prove_with_higher_fri_output_degree():
    """Full pipeline with fri_final_degree_plus_one=4."""
    from hodor_tpu.air import Fibonacci, TestTraceSystem
    from hodor_tpu.prover import Prover
    from hodor_tpu.verifier import Verifier

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=4)
    proof = prover.prove(witness)
    assert len(proof.fri_proof_h1.final_coefficients) == 4
    assert Verifier(props, lde_factor=16).verify(proof)


def test_fri_pair_matches_singles():
    """proofs_from_lde_pair (the prover's one-program h1+h2 ladder) must
    be bit-identical to two independent proof_from_lde chains - roots,
    challenges, final coefficients, and every intermediate vector."""
    field = F257
    lde1 = _make_lde(field, 4, 8, seed=7)   # h1-sized
    lde2 = _make_lde(field, 3, 8, seed=8)   # h2-sized (smaller domain)
    p1, p2 = NaiveFriIop.proofs_from_lde_pair(lde1, lde2, 8, 1, field)
    s1 = NaiveFriIop.proof_from_lde(lde1, 8, 1, field)
    s2 = NaiveFriIop.proof_from_lde(lde2, 8, 1, field)
    ops = ops_for(field)
    for pair, single in ((p1, s1), (p2, s2)):
        assert pair.get_roots() == single.get_roots()
        assert pair.challenges == single.challenges
        assert pair.final_coefficients == single.final_coefficients
        assert pair.final_root == single.final_root
        for a, b in zip(pair.intermediate_values, single.intermediate_values):
            assert list(ops.decode(a)) == list(ops.decode(b))
