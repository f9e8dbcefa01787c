"""Native (C++ 4x u64 Montgomery) witness chains vs the Python chains.

The native generator (native/vdf_witness.cpp) is the host-side analog of
ff_ce's derived arithmetic the reference uses for witness generation
(src/experiments/vdf.rs:143-150); it must agree limb-for-limb with the
exact Python big-int chain for every field."""

import numpy as np
import pytest

from hodor_tpu.field import F257, F_BLS, F_STARK, ops_for
from hodor_tpu.utils.native import (
    cubic_vdf_witness_native,
    u64_rows_to_ints,
    vdf_witness_native,
)

OPS = 100


@pytest.mark.parametrize("field", [F257, F_STARK, F_BLS], ids=lambda f: f.name)
def test_native_vdf_chain_matches_python(field):
    res = vdf_witness_native(field, 1, 2, OPS)
    if res is None:
        pytest.skip("no native toolchain")
    p = field.p
    nr = p - 1
    v0, v1 = 1, 2
    py0, py1 = [v0], [v1]
    for _ in range(OPS):
        v0, v1 = (v0 * v0 + nr * v1 * v1) % p, 2 * v0 * v1 % p
        py0.append(v0)
        py1.append(v1)
    assert u64_rows_to_ints(res[0]) == py0
    assert u64_rows_to_ints(res[1]) == py1


@pytest.mark.parametrize("field", [F257, F_STARK], ids=lambda f: f.name)
def test_native_cubic_chain_matches_python(field):
    res = cubic_vdf_witness_native(field, 1, 2, OPS)
    if res is None:
        pytest.skip("no native toolchain")
    p = field.p
    r = p - 1

    def square(a, b):
        return (a * a + r * b * b) % p, 2 * a * b % p

    def mul(a, b, c, d):
        return (a * c + r * b * d) % p, (a * d + b * c) % p

    v0, v1 = 1, 2
    s0, s1 = square(v0, v1)
    cols = [[v0], [v1], [s0], [s1]]
    for _ in range(OPS):
        v0, v1 = mul(s0, s1, v0, v1)
        s0, s1 = square(v0, v1)
        for col, v in zip(cols, (v0, v1, s0, s1)):
            col.append(v)
    for col, got in zip(cols, res):
        assert u64_rows_to_ints(got) == col


def test_native_witness_encode_matches_list_encode():
    """encode_witness on the (R, N, 4) u64 format must produce the same
    device limbs as the int-list path."""
    from hodor_tpu.arp import ARPInstance
    from hodor_tpu.models import VDF

    field = F_STARK
    res = vdf_witness_native(field, 1, 2, 31)
    if res is None:
        pytest.skip("no native toolchain")
    native_w = np.stack(res)
    witness, props = VDF(field, 1, 2, 31).into_arp()
    arp = ARPInstance.from_instance(props)
    a = np.asarray(arp.encode_witness(witness))
    b = np.asarray(arp.encode_witness(native_w))
    assert (a == b).all()


def test_vdf_into_arp_native_toggle(monkeypatch):
    """Forcing the native path must yield an identical instance."""
    from hodor_tpu.models import VDF

    monkeypatch.setenv("HODOR_NATIVE_WITNESS", "1")
    wn, pn = VDF(F_STARK, 1, 2, 15).into_arp()
    monkeypatch.setenv("HODOR_NATIVE_WITNESS", "0")
    wp, pp = VDF(F_STARK, 1, 2, 15).into_arp()
    if isinstance(wn, np.ndarray):
        assert [u64_rows_to_ints(col) for col in wn] == wp
    assert [b.value for b in pn.boundary_constraints] == [
        b.value for b in pp.boundary_constraints
    ]