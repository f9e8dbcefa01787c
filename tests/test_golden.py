"""Golden conformance vectors: frozen proof bytes + Fiat-Shamir
challenge sequences for the two anchor instances (Fibonacci over F_257,
quadratic VDF T=32 over the 2^251 benchmark field).

These freeze the ENTIRE protocol surface - transcript byte encoding
(BE canonical + shave, src/transcript/mod.rs:60-79), Merkle leaf bytes
(LE raw Montgomery padded to 32, src/iop/blake2s_trivial_iop.rs:36-61),
challenge ordering (src/ali/per_register/mod.rs:425-432), and the proof
serialization itself. Any change to FS ordering/encoding fails here.

Regenerate (only for a deliberate, audited protocol change):
    python scripts/gen_golden.py
"""

import json
import os

import pytest

from hodor_tpu.field import F257, F_STARK
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _check(name, witness, props, field, lde_factor):
    prover = Prover(props.clone(), lde_factor=lde_factor, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=lde_factor).verify(proof)

    with open(os.path.join(GOLDEN, f"{name}.proof"), "rb") as f:
        expected = f.read()
    got = serialize_proof(proof, field)
    assert got == expected, f"{name}: proof bytes diverge from golden vector"

    with open(os.path.join(GOLDEN, f"{name}.challenges.json")) as f:
        expected_log = [tuple(e) for e in json.load(f)]
    got_log = [
        (kind, v if isinstance(v, str) else str(v))
        for kind, v in prover.last_transcript.log
    ]
    assert got_log == expected_log, f"{name}: challenge sequence diverges"


def test_fib_f257_golden():
    from hodor_tpu.air import Fibonacci, TestTraceSystem

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()
    _check("fib_f257", witness, props, F257, 16)


def test_vdf_fstark_golden():
    from hodor_tpu.models import VDF

    witness, props = VDF(F_STARK, 1, 2, 31).into_arp()
    _check("vdf_fstark_t32", witness, props, F_STARK, 16)


@pytest.mark.slow
def test_cubic_vdf_fstark_golden():
    from hodor_tpu.models import CubicVDF

    witness, props = CubicVDF(F_STARK, 1, 1, 31).into_arp()
    _check("cubic_vdf_fstark_t32", witness, props, F_STARK, 16)
