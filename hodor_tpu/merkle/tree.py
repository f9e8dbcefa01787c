"""Merkle tree build / query / verify over Blake2s digests.

Reference: Blake2sIopTree (src/iop/blake2s_trivial_iop.rs:113-290) with
the TrivialCombiner (natural index == tree index, leaf pairs (2i, 2i+1),
src/iop/trivial_coset_combiner.rs). The heap layout (nodes[1] = root,
node i has children 2i / 2i+1) is kept so paths and roots are
bit-identical; levels are built with log2(N) vectorized hashing steps
instead of the reference's thread-pool chunking (:147-219).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..field.field import Field
from ..domain import log2_floor
from .blake2s import (
    blake2s_keyed,
    digest_to_bytes,
    hash_leaves,
    hash_nodes,
    limbs_to_leaf_words,
)


def tree_drop_min() -> int:
    """Committed vectors with at least this many leaves keep only their
    ROOT on device after the build program (the level arrays become XLA
    temporaries); the fused query gather rebuilds them from the retained
    values. Halves resident tree memory at configs[3] scale (h trees are
    ~same bytes as their values) for one extra hashing pass over the
    dropped trees at query time. Override with HODOR_TREE_DROP_MIN
    (leaf count; 0 disables dropping entirely)."""
    import os

    v = os.environ.get("HODOR_TREE_DROP_MIN")
    if v is None:
        return 1 << 22
    n = int(v)
    return n if n > 0 else (1 << 62)


@partial(jax.jit, static_argnums=())
def _build_levels(leaf_limbs):
    """leaf_limbs (N, n16) -> (leaf_hashes (N,8), levels top..bottom list).

    levels[k] has 2^(k+?) ... returned bottom-up: levels[0] is the first
    internal level (N/2 digests), levels[-1] is the root (1 digest).
    """
    words = limbs_to_leaf_words(leaf_limbs)
    leaf_hashes = hash_leaves(words)
    levels = []
    cur = leaf_hashes
    while cur.shape[0] > 1:
        # NOTE: concat(cur[0::2], cur[1::2], axis=-1) IS cur.reshape
        # (n/2, 16) — but replacing it with the "free" reshape REGRESSED
        # runtime HBM at the 2^20-row prove (run5e steps 1-2 exhausted
        # stage1 where the gather+concat form ran): the materialized
        # concat acts as a fusion barrier XLA schedules tightly, while
        # the reshape fused the downstream limb-major transpose into a
        # worse-living buffer. Keep the explicit form.
        nxt = hash_nodes(cur[0::2], cur[1::2])
        levels.append(nxt)
        cur = nxt
    return leaf_hashes, levels


@dataclasses.dataclass
class IopQuery:
    """A Merkle opening (reference TrivialBlake2sIopQuery,
    src/iop/blake2s_trivial_iop.rs:349-374). natural == tree index."""

    index: int
    value: int  # canonical field int
    path: List[bytes]

    @property
    def natural_index(self) -> int:
        return self.index

    @property
    def tree_index(self) -> int:
        return self.index


class MerkleTree:
    """Device-built Blake2s commitment tree over field-element leaves.

    The root is fetched lazily: fused prover programs (one jit spanning
    many trees) pass `root_bytes` up front so constructing a tree costs
    zero host round trips."""

    def __init__(self, leaf_hashes, levels, field: Field, root_bytes: bytes = None,
                 size: int = None):
        self.field = field
        self.leaf_hashes = leaf_hashes  # (N, 8) uint32 device; None if DROPPED
        self.levels = levels  # bottom-up internal levels; None if DROPPED
        self.size = int(leaf_hashes.shape[0]) if leaf_hashes is not None else size
        self._root_bytes = root_bytes

    @property
    def dropped(self) -> bool:
        """True when only the root was kept (HBM budget: committed
        vectors >= tree_drop_min() output just the root from their build
        program, so the level arrays are XLA temporaries, and the query
        gather program rebuilds them from the committed values)."""
        return self.leaf_hashes is None

    @staticmethod
    def create(leaf_limbs, field: Field) -> "MerkleTree":
        """leaf_limbs: (N, n16) Montgomery limbs (N a power of two)."""
        n = leaf_limbs.shape[0]
        assert n & (n - 1) == 0
        leaf_hashes, levels = _build_levels(leaf_limbs)
        return MerkleTree(leaf_hashes, levels, field)

    def get_root(self) -> bytes:
        if self._root_bytes is None:
            self._root_bytes = digest_to_bytes(jax.device_get(self.levels[-1][0]))
        return self._root_bytes

    def get_challenge_scalar_from_root(self) -> int:
        """Root -> field challenge (encode_root_into_challenge,
        src/iop/blake2s_trivial_iop.rs:226-234: BE read + shave)."""
        return self.field.from_be_with_shave(self.get_root())

    def get_path(self, tree_index: int) -> List[bytes]:
        """Sibling path: [pair leaf hash, then internal siblings up to the
        root's children] (src/iop/blake2s_trivial_iop.rs:281-311)."""
        path = [digest_to_bytes(jax.device_get(self.leaf_hashes[tree_index ^ 1]))]
        idx = tree_index >> 1
        # internal levels except the root level
        for level in self.levels[:-1]:
            path.append(digest_to_bytes(jax.device_get(level[idx ^ 1])))
            idx >>= 1
        return path

    def path_arrays(self, idx):
        """Traceable batched path gather: idx (Q,) int32 -> (depth, Q, 8)
        sibling digests bottom-up (one jittable gather for all levels,
        replacing the per-level device_get of get_path)."""
        sibs = [jnp.take(self.leaf_hashes, idx ^ 1, axis=0)]
        cur = idx >> 1
        for level in self.levels[:-1]:
            sibs.append(jnp.take(level, cur ^ 1, axis=0))
            cur = cur >> 1
        return jnp.stack(sibs, axis=0)

    def query(self, natural_index: int, leaf_values_canonical) -> IopQuery:
        """Produce an opening; leaf_values_canonical is an object ndarray of
        canonical ints (the committed vector)."""
        value = int(leaf_values_canonical[natural_index])
        return IopQuery(
            index=natural_index,
            value=value,
            path=self.get_path(natural_index),
        )


def verify_path(root: bytes, leaf_value: int, path: List[bytes], tree_index: int, field: Field) -> bool:
    """Host-side path verification (reference Blake2sIopTree::verify,
    src/iop/blake2s_trivial_iop.rs:259-279): hash the leaf's 32-byte raw
    LE repr, then fold siblings left/right by index parity. Uses the
    native C++ extension when available."""
    raw = field.raw_repr_le(leaf_value).ljust(32, b"\x00")
    from ..utils import native

    if native.available():
        return bool(native.verify_path(root, raw, path, tree_index))
    h = blake2s_keyed(raw)
    idx = tree_index
    for sibling in path:
        if idx & 1 == 0:
            h = blake2s_keyed(h + sibling)
        else:
            h = blake2s_keyed(sibling + h)
        idx >>= 1
    return h == root


def encode_root_into_challenge(root: bytes, field: Field) -> int:
    return field.from_be_with_shave(root)
