"""Verifier-level negative tests (VERDICT round-1 weak item 6):
corrupted Merkle paths, wrong query indices, tampered FRI data, and
proof_io mutation fuzzing - every tamper must be rejected, either by a
False verdict or an InvalidValueError/UnsatisfiedError raise.

Reference behavior: src/verifier/mod.rs:326-399 returns Ok(false) on
any path/index mismatch; deserialization errors surface as Err.
"""

import copy
import random

import pytest

from hodor_tpu.errors import SynthesisError
from hodor_tpu.field import F257
from hodor_tpu.proof_io import deserialize_proof, serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


@pytest.fixture(scope="module")
def fib_proof():
    from hodor_tpu.air import Fibonacci, TestTraceSystem

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    return proof, props


def _verify(proof, props):
    try:
        return Verifier(props, lde_factor=16).verify(proof)
    except SynthesisError:
        return False


def test_baseline_accepts(fib_proof):
    proof, props = fib_proof
    assert _verify(proof, props)


def test_corrupt_f_query_path(fib_proof):
    proof, props = fib_proof
    p2 = copy.deepcopy(proof)
    path = p2.f_queries[0].path
    path[0] = bytes(32)
    assert not _verify(p2, props)
    p2 = copy.deepcopy(proof)
    p2.f_queries[0].path[-1] = b"\xff" * 32
    assert not _verify(p2, props)


def test_corrupt_g_query_index(fib_proof):
    proof, props = fib_proof
    p2 = copy.deepcopy(proof)
    p2.g_query.index ^= 1
    assert not _verify(p2, props)


def test_corrupt_fri_query_value(fib_proof):
    proof, props = fib_proof
    p2 = copy.deepcopy(proof)
    p2.fri_proof_h1.queries[0].value = (p2.fri_proof_h1.queries[0].value + 1) % F257.p
    assert not _verify(p2, props)


def test_corrupt_fri_final_coefficients(fib_proof):
    proof, props = fib_proof
    p2 = copy.deepcopy(proof)
    p2.fri_proof_h2.final_coefficients = [
        (c + 1) % F257.p for c in p2.fri_proof_h2.final_coefficients
    ]
    assert not _verify(p2, props)


def test_corrupt_roots(fib_proof):
    """f roots and the LAST h1/h2 roots are transcript-bound; like the
    reference (src/verifier/mod.rs:271, :305-310), earlier h*_iop_roots
    entries are redundant copies of the FRI-proof roots and are checked
    only through fri_proof.roots."""
    proof, props = fib_proof
    p2 = copy.deepcopy(proof)
    p2.f_iop_roots[0] = bytes(32)
    assert not _verify(p2, props)
    for field_name in ("h1_iop_roots", "h2_iop_roots"):
        p2 = copy.deepcopy(proof)
        getattr(p2, field_name)[-1] = bytes(32)
        assert not _verify(p2, props), field_name


def _unchecked_spans(proof):
    """Byte spans of the redundant (reference-parity unchecked)
    non-final h1/h2_iop_roots entries, located by diffing serializations."""
    base = serialize_proof(proof, F257)
    spans = []
    for field_name in ("h1_iop_roots", "h2_iop_roots"):
        roots = getattr(proof, field_name)
        for i in range(len(roots) - 1):
            p2 = copy.deepcopy(proof)
            getattr(p2, field_name)[i] = bytes(
                (b ^ 0xFF) for b in getattr(p2, field_name)[i]
            )
            other = serialize_proof(p2, F257)
            diff = [k for k in range(len(base)) if base[k] != other[k]]
            spans.append(range(diff[0], diff[-1] + 1))
    return spans


def test_proof_bytes_mutation_fuzz(fib_proof):
    """Random single-byte mutations: deserialization either raises a
    SynthesisError subclass or the proof fails verification - except in
    the redundant non-final h*_iop_roots copies, which the reference
    verifier never reads (see test_corrupt_roots)."""
    proof, props = fib_proof
    blob = bytearray(serialize_proof(proof, F257))
    skip = _unchecked_spans(proof)
    rng = random.Random(99)
    tried = rejected = 0
    while tried < 30:
        pos = rng.randrange(8, len(blob))  # skip magic/version
        if any(pos in s for s in skip):
            continue
        tried += 1
        mutated = bytearray(blob)
        mutated[pos] = (mutated[pos] + rng.randrange(1, 256)) % 256
        try:
            p2 = deserialize_proof(bytes(mutated), F257)
        except SynthesisError:
            rejected += 1
            continue
        if not _verify(p2, props):
            rejected += 1
    assert rejected == 30


def test_truncated_proof_rejected(fib_proof):
    proof, props = fib_proof
    blob = serialize_proof(proof, F257)
    for cut in (10, len(blob) // 2, len(blob) - 1):
        with pytest.raises(SynthesisError):
            deserialize_proof(blob[:cut], F257)
