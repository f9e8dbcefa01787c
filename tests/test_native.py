"""Native C++ host component: bit-exact equivalence with hashlib and the
device Merkle tree (native/blake2s.cpp via ctypes)."""

import hashlib

import numpy as np
import pytest

from hodor_tpu.field import F_STARK, ops_for
from hodor_tpu.merkle import MerkleTree
from hodor_tpu.merkle.blake2s import KEY, PERSONAL
from hodor_tpu.utils import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no g++/native lib")


def test_native_blake2s_matches_hashlib():
    for msg in (b"", b"a", b"x" * 32, b"y" * 64, b"z" * 100):
        ref = hashlib.blake2s(msg, key=KEY, person=PERSONAL).digest()
        assert native.blake2s_keyed(msg) == ref


def test_native_tree_matches_device_tree():
    ops = ops_for(F_STARK)
    vals = [pow(5, i, F_STARK.p) for i in range(64)]
    tree = MerkleTree.create(ops.encode(vals), F_STARK)
    leaves = b"".join(F_STARK.raw_repr_le(v).ljust(32, b"\x00") for v in vals)
    _lh, nodes = native.build_tree(leaves, 64)
    assert nodes[32:64] == tree.get_root()


def test_native_verify_path_round_trip():
    ops = ops_for(F_STARK)
    vals = [pow(7, i, F_STARK.p) for i in range(32)]
    tree = MerkleTree.create(ops.encode(vals), F_STARK)
    root = tree.get_root()
    arr = np.array(vals, dtype=object)
    for i in (0, 13, 31):
        q = tree.query(i, arr)
        leaf32 = F_STARK.raw_repr_le(q.value).ljust(32, b"\x00")
        assert native.verify_path(root, leaf32, q.path, i)
        assert not native.verify_path(root, leaf32, q.path, i ^ 1)
