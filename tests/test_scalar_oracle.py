"""Independent conformance check (VERDICT round-2 item 5): the scalar
oracle (tests/scalar_oracle.py — pure Python ints + hashlib, zero
hodor_tpu imports, a literal transcription of the Rust control flow in
src/prover/mod.rs:66-174, src/ali/per_register/mod.rs:246-529,
src/ali/per_register/deep.rs:14-148, src/fri/fri_on_values.rs:11-159)
must reproduce the golden proof bytes AND the full Fiat-Shamir challenge
log byte-for-byte. This catches ordering/encoding bugs shared between
hodor_tpu/prover.py and hodor_tpu/verifier.py, which the self-generated
goldens alone cannot.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import scalar_oracle as so  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name):
    with open(os.path.join(GOLDEN, f"{name}.proof"), "rb") as f:
        blob = f.read()
    with open(os.path.join(GOLDEN, f"{name}.challenges.json")) as f:
        log = [tuple(e) for e in json.load(f)]
    return blob, log


@pytest.mark.parametrize(
    "name,field,instance",
    [
        ("fib_f257", so.F257, lambda: so.fibonacci_instance(so.F257)),
        ("vdf_fstark_t32", so.F_STARK, lambda: so.vdf_instance(so.F_STARK, 1, 2, 31)),
        (
            "cubic_vdf_fstark_t32",
            so.F_STARK,
            lambda: so.cubic_vdf_instance(so.F_STARK, 1, 1, 31),
        ),
    ],
)
def test_oracle_reproduces_golden(name, field, instance):
    witness, props = instance()
    proof, log = so.prove(field, witness, props, lde_factor=16,
                          fri_final_degree_plus_one=1)
    blob = so.serialize(proof, field)
    golden_blob, golden_log = _golden(name)
    assert log == golden_log, (
        f"challenge log diverges at entry "
        f"{next(i for i, (a, b) in enumerate(zip(log, golden_log)) if a != b)}"
    )
    assert blob == golden_blob, (
        f"proof bytes diverge at offset "
        f"{next(i for i, (a, b) in enumerate(zip(blob, golden_blob)) if a != b)}"
        f" (lengths {len(blob)} vs {len(golden_blob)})"
    )
