"""Config dataclass + structured stage-timing facility (SURVEY §5)."""

import json

import pytest

from hodor_tpu.config import ProofSystemConfig
from hodor_tpu.field import F257
from hodor_tpu.profiling import StageTimer
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover


def _fib():
    from hodor_tpu.air import Fibonacci, TestTraceSystem

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    return tracer.into_arp()


def test_config_validation():
    ProofSystemConfig(lde_factor=8)
    with pytest.raises(ValueError):
        ProofSystemConfig(lde_factor=12)
    with pytest.raises(ValueError):
        ProofSystemConfig(fri_final_degree_plus_one=3)
    with pytest.raises(ValueError):
        ProofSystemConfig(transcript="sha3")
    with pytest.raises(ValueError):
        ProofSystemConfig(iop_hash="poseidon")


@pytest.mark.slow  # full prove comparison; attribute parity is cheap and fast
def test_prover_from_config_matches_direct():
    witness, props = _fib()
    cfg = ProofSystemConfig(lde_factor=16, fri_final_degree_plus_one=1)
    p1 = Prover.from_config(props.clone(), cfg).prove(witness)
    p2 = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1).prove(witness)
    assert serialize_proof(p1, F257) == serialize_proof(p2, F257)


def test_prove_stage_timings_recorded():
    witness, props = _fib()
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    prover.prove(witness)
    stages = prover.last_timings.as_dict()
    for name in (
        "witness+f_ldes+f_oracles",
        "g_composition+g_oracle",
        "deep",
        "fri_h1+h2",
        "queries",
    ):
        assert name in stages
    payload = json.loads(prover.last_timings.to_json())
    assert payload["total_s"] > 0


def test_stage_timer_disabled():
    t = StageTimer(enabled=False)
    with t.stage("x"):
        pass
    assert t.records == [] and t.total() == 0
