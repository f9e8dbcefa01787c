"""Regression-lock the prove dispatch floor (BASELINE.md "exactly FIVE
device->host transfers"; VERDICT round-2 weak item 2).

A warm `Prover.prove` must make exactly five explicit `jax.device_get`
calls — the Fiat-Shamir sync points (stage-1 roots, G root, DEEP
scalars, FRI-pair roots+coefficients, query gather) — and NO implicit
device->host transfers at all (a stray `np.asarray(dev_array)` /
`int(dev_scalar)` would silently restore the ~30 ms-per-dispatch
tunnel-RTT behavior round 2 worked to kill). The count is structural
(one per protocol commit point, src/prover/mod.rs:82-151), so it is
backend-independent and checkable on CPU.
"""

import jax
import numpy as np

from hodor_tpu.air import Fibonacci, TestTraceSystem
from hodor_tpu.field import F257
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

EXPECTED_SYNCS = 5


def test_warm_prove_transfer_count(monkeypatch):
    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    witness, props = tracer.into_arp()

    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)  # cold: compiles everything
    assert Verifier(props, lde_factor=16).verify(proof)

    real_get = jax.device_get
    calls = []

    def counting_get(x):
        # only calls that actually move device data count as syncs;
        # device_get on a host-side numpy pytree is a no-op
        has_device_array = any(
            isinstance(leaf, jax.Array) for leaf in jax.tree_util.tree_leaves(x)
        )
        if has_device_array:
            calls.append(type(x).__name__)
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", counting_get)
    # "disallow" blocks IMPLICIT device->host transfers while allowing
    # explicit jax.device_get, so every transfer in the prove is (a)
    # explicit and (b) counted
    with jax.transfer_guard_device_to_host("disallow"):
        proof2 = prover.prove(witness)
    monkeypatch.undo()

    assert len(calls) == EXPECTED_SYNCS, (
        f"warm prove made {len(calls)} explicit device_get syncs "
        f"(expected {EXPECTED_SYNCS}): {calls}"
    )
    assert Verifier(props, lde_factor=16).verify(proof2)
