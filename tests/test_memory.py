"""HBM budget machinery (BASELINE.md §memory): trees above
HODOR_TREE_DROP_MIN leaves keep only their root after the build program
(the level arrays are XLA temporaries) and are rebuilt as temporaries
inside the fused query gather. These tests force the threshold to 1 so
EVERY oracle and FRI round takes the drop/rebuild path, and assert the
proof bytes are still bit-identical to the golden vector — i.e. the
memory optimisation is invisible to the protocol.
"""

import json
import os

from hodor_tpu.field import F257
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _fib():
    from hodor_tpu.air import Fibonacci, TestTraceSystem

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    return tracer.into_arp()


def test_dropped_trees_reproduce_golden(monkeypatch):
    monkeypatch.setenv("HODOR_TREE_DROP_MIN", "1")
    witness, props = _fib()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=16).verify(proof)
    with open(os.path.join(GOLDEN, "fib_f257.proof"), "rb") as f:
        expected = f.read()
    assert serialize_proof(proof, F257) == expected


def test_dropped_trees_shrink_program_outputs(monkeypatch):
    """The stage-1 program with dropping engaged must carry materially
    smaller outputs (the per-register trees stay inside the program)."""
    import jax

    witness, props = _fib()

    def compiled_output_bytes():
        p = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
        wd = p.arp.encode_witness(witness)
        return p._stage1_fn.lower(wd).compile().memory_analysis().output_size_in_bytes

    monkeypatch.setenv("HODOR_TREE_DROP_MIN", "0")  # 0 disables dropping
    full = compiled_output_bytes()
    monkeypatch.setenv("HODOR_TREE_DROP_MIN", "1")
    dropped = compiled_output_bytes()
    assert dropped < 0.8 * full, (full, dropped)


def test_eager_fri_ladder_reproduces_golden(monkeypatch):
    """HODOR_FRI_EAGER=1 (per-round dispatch, OOM escape hatch) must be
    protocol-invisible: identical golden bytes."""
    monkeypatch.setenv("HODOR_FRI_EAGER", "1")
    witness, props = _fib()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    with open(os.path.join(GOLDEN, "fib_f257.proof"), "rb") as f:
        expected = f.read()
    assert serialize_proof(proof, F257) == expected
