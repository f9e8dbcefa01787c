"""End-to-end prove + verify round trips - the conformance anchors.

Ports test_fib_prover (src/prover/mod.rs:177-227) and the negative
soundness test test_soundness_of_fib_prover (:229-281): the full
pipeline over F_257 with lde_factor 16, plus intermediate-stage checks
mirroring test_fib_conversion_into_per_register_arp
(src/arp/per_register/mod.rs:268-306) and test_fib_conversion_into_ali
(src/ali/per_register/mod.rs:532-571).
"""

import pytest

from hodor_tpu.air import Fibonacci, TestTraceSystem
from hodor_tpu.arp import ARPInstance
from hodor_tpu.errors import UnsatisfiedError
from hodor_tpu.field import F257, ops_for
from hodor_tpu.ntt import ntt
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


def make_fib_instance():
    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    return tracer.into_arp()


def test_fib_witness():
    witness, props = make_fib_instance()
    # fib: a=[1,1,2,3], b=[1,2,3,5]
    assert witness[0] == [1, 1, 2, 3]
    assert witness[1] == [1, 2, 3, 5]
    assert props.num_rows == 4
    assert props.num_registers == 2
    assert len(props.constraints) == 2
    assert len(props.boundary_constraints) == 3


def test_fib_arp_satisfied_and_witness_polys():
    witness, props = make_fib_instance()
    ARPInstance.is_satisfied(props, witness)
    arp = ARPInstance.from_instance(props)
    ops = ops_for(F257)
    w_dev = arp.encode_witness(witness)
    polys = arp.calculate_witness_polys(w_dev)
    # fft(poly) must reproduce the witness columns
    vals = ops.decode(ntt(ops, polys))
    for r in range(2):
        assert [int(v) for v in vals[r]] == witness[r]


def test_fib_arp_unsatisfied_detected():
    witness, props = make_fib_instance()
    witness[0][1] = 123 % F257.p
    with pytest.raises(UnsatisfiedError):
        ARPInstance.is_satisfied(props, witness)


def test_fib_ali_g_has_expected_zero():
    # mirrors test_fib_conversion_into_ali: G coefficient 3 must vanish
    from hodor_tpu.ali import ALIInstance
    from hodor_tpu.transcript import Blake2sTranscript

    witness, props = make_fib_instance()
    arp = ARPInstance.from_instance(props)
    polys = arp.calculate_witness_polys(arp.encode_witness(witness))
    ali = ALIInstance(arp)
    transcript = Blake2sTranscript(F257)
    transcript.commit_field_element(123)
    g = ali.calculate_g(transcript, polys)
    ops = ops_for(F257)
    g_coeffs = [int(v) for v in ops.decode(g)]
    assert g_coeffs[3] == 0


def test_fib_prover_roundtrip():
    witness, props = make_fib_instance()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    verifier = Verifier(props, lde_factor=16)
    assert verifier.verify(proof)


def test_soundness_of_fib_prover():
    witness, props = make_fib_instance()
    witness[0][1] = 123 % F257.p
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    verifier = Verifier(props, lde_factor=16)
    assert not verifier.verify(proof)
