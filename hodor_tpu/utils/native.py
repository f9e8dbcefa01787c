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
