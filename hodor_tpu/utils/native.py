"""ctypes bindings for the native host component (native/blake2s.cpp).

Compiled on first use with g++ (cached as native/libhodor_native.so);
falls back to pure-Python hashlib when no compiler is available. Used by
the host verifier and proof serialization for fast keyed Blake2s and
Merkle path checks - the host-side counterpart of the reference's
thread-pool hashing (src/iop/blake2s_trivial_iop.rs:147-219).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "blake2s.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libhodor_native.so"))
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o", so, src],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.hodor_blake2s.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
    lib.hodor_verify_path.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_long,
        ctypes.c_char_p,
    ]
    lib.hodor_verify_path.restype = ctypes.c_int
    lib.hodor_hash_leaves.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p]
    lib.hodor_hash_level.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p]
    lib.hodor_build_tree.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    return lib


@lru_cache(maxsize=1)
def _vdf_lib() -> Optional[ctypes.CDLL]:
    """native/vdf_witness.cpp: 4x u64 Montgomery witness chains (the
    host-side analog of ff_ce's derived arithmetic the reference uses
    for witness generation, src/experiments/vdf.rs:143-150)."""
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "vdf_witness.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libhodor_vdf.so"))
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
    lib.hodor_vdf_witness.argtypes = [u64p, ctypes.c_uint64] + [u64p] * 4 + [
        ctypes.c_long,
    ] + [u64p] * 2
    lib.hodor_cubic_vdf_witness.argtypes = [u64p, ctypes.c_uint64] + [u64p] * 4 + [
        ctypes.c_long,
    ] + [u64p] * 4
    return lib


def _field_mont_params(field):
    """(p_limbs, inv, r2) for the native 4x u64 Montgomery core."""
    p = field.p
    if p % 2 == 0 or field.num_bits > 256:
        return None
    to4 = lambda v: np.array(
        [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)], dtype=np.uint64
    )
    inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    r2 = pow(1 << 256, 2, p)
    return to4(p), inv, to4(r2), to4


def vdf_witness_native(field, c0: int, c1: int, num_ops: int):
    """Quadratic VDF chain via C++; returns (c0_w, c1_w) as
    (num_ops+1, 4) uint64 canonical LE limb arrays, or None."""
    lib = _vdf_lib()
    params = _field_mont_params(field)
    if lib is None or params is None:
        return None
    p_limbs, inv, r2, to4 = params
    n = num_ops + 1
    out0 = np.empty((n, 4), dtype=np.uint64)
    out1 = np.empty((n, 4), dtype=np.uint64)
    lib.hodor_vdf_witness(
        p_limbs, inv, r2, to4((field.p - 1) % field.p), to4(c0 % field.p),
        to4(c1 % field.p), num_ops, out0, out1,
    )
    return out0, out1


def cubic_vdf_witness_native(field, c0: int, c1: int, num_ops: int):
    """Cubic VDF chain via C++; returns (c0_w, c1_w, sq0_w, sq1_w) as
    (num_ops+1, 4) uint64 canonical LE limb arrays, or None."""
    lib = _vdf_lib()
    params = _field_mont_params(field)
    if lib is None or params is None:
        return None
    p_limbs, inv, r2, to4 = params
    n = num_ops + 1
    outs = [np.empty((n, 4), dtype=np.uint64) for _ in range(4)]
    lib.hodor_cubic_vdf_witness(
        p_limbs, inv, r2, to4((field.p - 1) % field.p), to4(c0 % field.p),
        to4(c1 % field.p), num_ops, *outs,
    )
    return tuple(outs)


def u64_rows_to_ints(rows: "np.ndarray") -> List[int]:
    """(N, 4) uint64 LE limbs -> list of Python ints (used only for the
    few boundary values; bulk data goes straight to device limbs)."""
    return [
        int(r[0]) | (int(r[1]) << 64) | (int(r[2]) << 128) | (int(r[3]) << 192)
        for r in rows
    ]


def available() -> bool:
    return _lib() is not None


def blake2s_keyed(data: bytes) -> bytes:
    lib = _lib()
    if lib is None:
        from ..merkle.blake2s import blake2s_keyed as py_hash

        return py_hash(data)
    out = ctypes.create_string_buffer(32)
    lib.hodor_blake2s(data, len(data), out)
    return out.raw


def verify_path(root: bytes, leaf32: bytes, path: List[bytes], tree_index: int) -> bool:
    lib = _lib()
    if lib is None:
        return None  # caller falls back
    joined = b"".join(path)
    return bool(lib.hodor_verify_path(leaf32, joined, len(path), tree_index, root))


def hash_leaves(leaves32: bytes, n: int) -> bytes:
    lib = _lib()
    assert lib is not None
    out = ctypes.create_string_buffer(32 * n)
    lib.hodor_hash_leaves(leaves32, n, out)
    return out.raw


def build_tree(leaves32: bytes, n: int):
    """Returns (leaf_hashes bytes, nodes bytes) in the reference heap
    layout (nodes[1] = root)."""
    lib = _lib()
    assert lib is not None
    leaf_hashes = ctypes.create_string_buffer(32 * n)
    nodes = ctypes.create_string_buffer(32 * n)
    lib.hodor_build_tree(leaves32, n, leaf_hashes, nodes)
    return leaf_hashes.raw, nodes.raw
