"""Batched proving (Prover.prove_batch): B proofs run every device
stage as ONE vmapped program, and each proof is byte-identical to
prove() of the same witness — a throughput mode the reference's
one-proof-per-call API (src/prover/mod.rs:66) cannot express."""

import pytest

from hodor_tpu.field import F_STARK
from hodor_tpu.models import VDF
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


@pytest.mark.slow
def test_prove_batch_byte_identical_and_verifies():
    # One instance (T=8 quadratic VDF), three witnesses: the honest one
    # plus two from different VDF starts. The prover is witness-blind
    # (satisfiability is the verifier's job), so every batched proof
    # must byte-match its sequential prove — DISTINCT witnesses give
    # distinct Merkle roots, so per-proof Fiat-Shamir challenges diverge
    # and any cross-wiring between batch lanes breaks byte-identity.
    witness, props = VDF(F_STARK, 1, 2, 7).into_arp()
    w2, _ = VDF(F_STARK, 3, 5, 7).into_arp()
    w3, _ = VDF(F_STARK, 2, 9, 7).into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    singles = [serialize_proof(prover.prove(w), F_STARK) for w in (witness, w2, w3)]

    batch = prover.prove_batch([witness, w2, w3])
    assert len(batch) == 3
    assert [serialize_proof(pf, F_STARK) for pf in batch] == singles

    verifier = Verifier(props, lde_factor=16)
    assert verifier.verify(batch[0])  # honest witness
    for pf in batch[1:]:  # wrong-witness proofs must not verify
        ok = False
        try:
            ok = verifier.verify(pf)
        except Exception:
            pass
        assert not ok


def test_prove_batch_fib_f257_byte_identical():
    """Fast batch coverage on the tiny field: two lanes with DIVERGING
    witnesses (honest + corrupted) must each byte-match their sequential
    prove — distinct Merkle roots make per-lane challenges diverge, so
    cross-wiring between lanes breaks byte-identity."""
    from hodor_tpu.air import Fibonacci, TestTraceSystem
    from hodor_tpu.field import F257

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)

    # In the tiny field z can land inside the LDE domain and the prover
    # (correctly) raises DivisionByZeroError — pick a corruption delta
    # whose Fiat-Shamir z avoids it (deterministic once found)
    from hodor_tpu.errors import DivisionByZeroError

    corrupted = None
    corrupted_blob = None
    for delta in range(1, 40):
        cand = [list(col) for col in witness]
        cand[0][2] = (cand[0][2] + delta) % F257.p
        try:
            corrupted_blob = serialize_proof(prover.prove(cand), F257)
            corrupted = cand
            break
        except DivisionByZeroError:
            continue
    assert corrupted is not None, "no corruption delta avoided div-zero"
    singles = [serialize_proof(prover.prove(witness), F257), corrupted_blob]
    batch = prover.prove_batch([witness, corrupted])
    assert [serialize_proof(pf, F257) for pf in batch] == singles
    assert Verifier(props, lde_factor=16).verify(batch[0])


@pytest.mark.slow  # fallback is a one-line delegation; the fib test above is fast coverage
def test_prove_batch_singleton_falls_back():
    witness, props = VDF(F_STARK, 2, 3, 7).into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    baseline = serialize_proof(prover.prove(witness), F_STARK)
    (proof,) = prover.prove_batch([witness])
    assert serialize_proof(proof, F_STARK) == baseline


def test_prove_batch_mesh_fallback():
    """Documented behavior (Prover.prove_batch docstring): under a mesh
    the batch deliberately degrades to sequential distributed proves —
    the two batch entries must be byte-identical (same witness through
    the same sequential path) and verify. Uses F_P63 (4-limb field) so
    the sharded pipeline compiles in seconds. Byte-identity of a MESH
    prove against the meshless prove is separately covered by
    tests/test_distributed.py (this test used to re-prove meshless and
    was the slowest item of the cold suite at 204 s)."""
    from hodor_tpu.field import F_P63
    from hodor_tpu.parallel import make_mesh

    witness, props = VDF(F_P63, 1, 2, 15).into_arp()
    mesh = make_mesh(8)
    prover_mesh = Prover(
        props.clone(), lde_factor=8, fri_final_degree_plus_one=1, mesh=mesh
    )
    batch = prover_mesh.prove_batch([witness, witness])
    blobs = [serialize_proof(pf, F_P63) for pf in batch]
    assert blobs[0] == blobs[1]
    assert Verifier(props, lde_factor=8).verify(batch[0])
