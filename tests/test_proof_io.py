"""Proof serialization round trip (canonical byte format; the reference
left serialization unimplemented - README feature list)."""

from hodor_tpu.air import Fibonacci, TestTraceSystem
from hodor_tpu.field import F257
from hodor_tpu.proof_io import deserialize_proof, serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


def test_proof_serialization_roundtrip():
    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()

    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)

    blob = serialize_proof(proof, F257)
    restored = deserialize_proof(blob, F257)
    assert serialize_proof(restored, F257) == blob

    verifier = Verifier(props, lde_factor=16)
    assert verifier.verify(restored)

    # bit-flip anywhere in the body must break verification (or parsing)
    corrupted = bytearray(blob)
    corrupted[len(blob) // 2] ^= 1
    try:
        bad = deserialize_proof(bytes(corrupted), F257)
    except Exception:
        return
    assert not verifier.verify(bad)
