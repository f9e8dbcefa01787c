"""Generate the golden conformance vectors under tests/golden/.

Run ONCE (CPU backend) and commit the outputs; tests/test_golden.py
then fails if any Fiat-Shamir ordering, byte encoding, hash input, or
challenge derivation changes. The vectors were hand-audited against the
reference's ordering rules (src/ali/per_register/mod.rs:425-432,
src/transcript/mod.rs:60-79, src/iop/blake2s_trivial_iop.rs:36-61);
cargo is absent from this image so they cannot be regenerated from the
Rust reference directly (BASELINE.md).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_hodor_golden")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hodor_tpu.field import F257, F_STARK
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def fib_instance():
    from hodor_tpu.air import Fibonacci, TestTraceSystem

    fib = Fibonacci(F257, final_b=5, at_step=3)
    tracer = TestTraceSystem(F257)
    fib.trace(tracer)
    tracer.calculate_witness(1, 1, 3)
    return tracer.into_arp()


def vdf_instance():
    from hodor_tpu.models import VDF

    return VDF(F_STARK, 1, 2, 31).into_arp()  # T = 32 rows


def emit(name, witness, props, field, lde_factor):
    prover = Prover(props.clone(), lde_factor=lde_factor, fri_final_degree_plus_one=1)
    proof = prover.prove(witness)
    assert Verifier(props, lde_factor=lde_factor).verify(proof)
    blob = serialize_proof(proof, field)
    os.makedirs(GOLDEN, exist_ok=True)
    with open(os.path.join(GOLDEN, f"{name}.proof"), "wb") as f:
        f.write(blob)
    log = [
        [kind, v if isinstance(v, str) else str(v)]
        for kind, v in prover.last_transcript.log
    ]
    with open(os.path.join(GOLDEN, f"{name}.challenges.json"), "w") as f:
        json.dump(log, f, indent=1)
    print(f"{name}: {len(blob)} proof bytes, {len(log)} challenges")


def cubic_vdf_instance():
    from hodor_tpu.models import CubicVDF

    return CubicVDF(F_STARK, 1, 1, 31).into_arp()  # T = 32 rows


if __name__ == "__main__":
    import sys as _sys

    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    if only in (None, "fib_f257"):
        w, p = fib_instance()
        emit("fib_f257", w, p, F257, 16)
    if only in (None, "vdf_fstark_t32"):
        w, p = vdf_instance()
        emit("vdf_fstark_t32", w, p, F_STARK, 16)
    if only in (None, "cubic_vdf_fstark_t32"):
        w, p = cubic_vdf_instance()
        emit("cubic_vdf_fstark_t32", w, p, F_STARK, 16)
