"""Vectorized keyed Blake2s-256 for Merkle hashing on device.

The reference hashes every leaf and node with keyed Blake2s
(key = b"Squeamish Ossifrage", personal = b"Shaftoe",
src/iop/blake2s_trivial_iop.rs:8-16). Leaves are 32-byte little-endian
raw (Montgomery) reprs (:36-42), nodes are 64-byte concatenations of two
child digests (:99-109).

On TPU, a keyed hash of a <=64-byte message is exactly ONE compression
from a precomputed post-key-block state (the key block is constant), so
hashing millions of leaves is a single fused elementwise jnp program over
(N, 16)-word uint32 arrays - this replaces the reference's thread-pool
leaf hashing loop (src/iop/blake2s_trivial_iop.rs:147-165).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

KEY = b"Squeamish Ossifrage"
PERSONAL = b"Shaftoe"

_IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]


def _rotr(x, r):
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def _round(v, mm):
    """One Blake2s round on 16 state lanes; mm = SIGMA-permuted message."""
    _g(v, 0, 4, 8, 12, mm[0], mm[1])
    _g(v, 1, 5, 9, 13, mm[2], mm[3])
    _g(v, 2, 6, 10, 14, mm[4], mm[5])
    _g(v, 3, 7, 11, 15, mm[6], mm[7])
    _g(v, 0, 5, 10, 15, mm[8], mm[9])
    _g(v, 1, 6, 11, 12, mm[10], mm[11])
    _g(v, 2, 7, 8, 13, mm[12], mm[13])
    _g(v, 3, 4, 9, 14, mm[14], mm[15])
    return v


def compress(h, m, t: int, final: bool):
    """One Blake2s compression. h: (..., 8) uint32 state; m: (..., 16)
    uint32 message words (LE); t: total byte counter. Vectorized over
    leading dims. numpy inputs run a host loop; jnp inputs trace a
    fori_loop over the 10 rounds (keeps the compiled graph ~10x smaller
    than full unrolling, which made XLA CPU compile pathologically slow).
    """
    if not isinstance(m, jnp.ndarray):
        with np.errstate(over="ignore"):
            ones = np.uint32
            v = [h[..., i].astype(np.uint32) for i in range(8)] + [
                np.broadcast_to(np.uint32(_IV[i]), m.shape[:-1]).copy() for i in range(8)
            ]
            v[12] = v[12] ^ ones(t & 0xFFFFFFFF)
            v[13] = v[13] ^ ones((t >> 32) & 0xFFFFFFFF)
            if final:
                v[14] = v[14] ^ ones(0xFFFFFFFF)
            for r in range(10):
                s = _SIGMA[r]
                _round(v, [m[..., s[i]] for i in range(16)])
            return np.stack([h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)], axis=-1)

    lead = m.shape[:-1]
    v0 = [h[..., i] for i in range(8)] + [
        jnp.broadcast_to(jnp.uint32(int(_IV[i])), lead) for i in range(8)
    ]
    v0[12] = v0[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v0[13] = v0[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if final:
        v0[14] = v0[14] ^ jnp.uint32(0xFFFFFFFF)
    sigma = jnp.asarray(np.array(_SIGMA, dtype=np.int32))  # (10, 16)

    def body(r, v):
        perm = jnp.take(m, sigma[r], axis=-1)  # (..., 16)
        mm = [perm[..., i] for i in range(16)]
        v = list(v)
        v = _round(v, mm)
        return tuple(v)

    v = jax.lax.fori_loop(0, 10, body, tuple(v0))
    return jnp.stack([h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)], axis=-1)


def _param_words(digest_len: int, key_len: int, personal: bytes) -> np.ndarray:
    block = bytearray(32)
    block[0] = digest_len
    block[1] = key_len
    block[2] = 1  # fanout
    block[3] = 1  # depth
    block[24:32] = personal.ljust(8, b"\x00")
    return np.frombuffer(bytes(block), dtype="<u4").copy()


@lru_cache(maxsize=None)
def keyed_midstate(key: bytes = KEY, personal: bytes = PERSONAL) -> np.ndarray:
    """State h after absorbing the (constant) padded key block."""
    h0 = _IV ^ _param_words(32, len(key), personal)
    key_block = np.frombuffer(key.ljust(64, b"\x00"), dtype="<u4")
    return np.asarray(compress(h0, key_block, t=64, final=False))


# test hook: None = auto (real TPU only); "interpret" forces the Pallas
# blake2s kernel in interpret mode so CPU tests can cover it
_FORCE_PALLAS = None


def hash_block(m_words, message_bytes: int):
    """Keyed Blake2s of a single <=64-byte (padded) block, vectorized.
    m_words: (..., 16) uint32 LE words. Returns digests (..., 8) uint32.

    On TPU, large batches run in ONE fused Pallas kernel
    (field/pallas_kernels.pallas_blake2s: state in registers, one HBM
    read + one write per hash) instead of the 10-iteration XLA fori_loop
    whose state round-trips HBM every round."""
    from ..field.limbs import _pallas_enabled

    total = 1
    for s in m_words.shape[:-1]:
        total *= int(s)
    use_pallas = _FORCE_PALLAS == "interpret" or (
        _FORCE_PALLAS is None and _pallas_enabled("blake2s")
    )
    if use_pallas and total % 4096 == 0 and total > 0:
        from ..field.pallas_kernels import pallas_blake2s

        mid = tuple(int(v) for v in keyed_midstate())
        return pallas_blake2s(
            m_words, message_bytes, mid, interpret=_FORCE_PALLAS == "interpret"
        )
    mid = jnp.asarray(keyed_midstate())
    h = jnp.broadcast_to(mid, m_words.shape[:-1] + (8,))
    return compress(h, m_words, t=64 + message_bytes, final=True)


def hash_leaves(leaf_words):
    """Hash (N, 8)-word 32-byte leaves -> (N, 8) digests
    (reference hash_encoded_leaf, src/iop/blake2s_trivial_iop.rs:92-99)."""
    n = leaf_words.shape[0]
    padded = jnp.concatenate(
        [leaf_words, jnp.zeros((n, 8), jnp.uint32)], axis=-1
    )
    return hash_block(padded, 32)


def hash_nodes(left, right):
    """Hash pairs of 32-byte digests -> parent digests
    (reference hash_node, src/iop/blake2s_trivial_iop.rs:101-111)."""
    return hash_block(jnp.concatenate([left, right], axis=-1), 64)


def limbs_to_leaf_words(limbs):
    """(N, n16) Montgomery u16 limbs -> (N, 8) uint32 LE leaf words.

    The raw-repr LE bytes of the reference's leaf encoding
    (src/iop/blake2s_trivial_iop.rs:36-42) are exactly our little-endian
    16-bit limbs packed two per 32-bit word, zero-padded to 32 bytes."""
    n, n16 = limbs.shape
    assert n16 % 2 == 0
    words = limbs[:, 0::2] | (limbs[:, 1::2] << 16)  # (N, n16//2)
    if n16 // 2 < 8:
        words = jnp.concatenate(
            [words, jnp.zeros((n, 8 - n16 // 2), jnp.uint32)], axis=-1
        )
    return words


def digest_to_challenge_mont(ops, digest):
    """Device analog of encode_root_into_challenge
    (src/iop/blake2s_trivial_iop.rs:226-234 -> from_be_with_shave): map a
    (..., 8) uint32 LE-word digest to the Montgomery-form field element
    the host would derive from its bytes. Bit-exact with
    Field.from_be_with_shave for every field whose shave mask guarantees
    the value < p (true for all three reference fields: the mask keeps
    < 2^CAPACITY <= p bits). Lets Fiat-Shamir-free FRI fold challenges
    (which never touch the transcript, src/fri/fri_on_values.rs:106-109)
    stay on device across all rounds."""
    field = ops.field
    n16 = ops.n16
    rs = field.repr_size  # == 2 * n16 bytes read big-endian
    limbs = []
    for i in range(n16):
        b0 = rs - 1 - 2 * i  # raw digest index of canonical LE byte 2i
        b1 = rs - 2 - 2 * i
        lo = (digest[..., b0 // 4] >> jnp.uint32(8 * (b0 % 4))) & jnp.uint32(0xFF)
        hi = (digest[..., b1 // 4] >> jnp.uint32(8 * (b1 % 4))) & jnp.uint32(0xFF)
        limbs.append(lo | (hi << jnp.uint32(8)))
    x = jnp.stack(limbs, axis=-1)  # (..., n16) canonical, unmasked
    shave = 256 - field.capacity
    mask64 = 0xFFFFFFFFFFFFFFFF >> (shave % 64)
    masks = np.full(n16, 0xFFFF, dtype=np.uint32)
    for k in range(4):
        masks[4 * (field.n64 - 1) + k] = (mask64 >> (16 * k)) & 0xFFFF
    x = x & jnp.asarray(masks)
    return ops.to_mont_arr(x)


def blake2s_keyed(data: bytes) -> bytes:
    """Host-side reference keyed hash (for transcript & verification)."""
    import hashlib

    return hashlib.blake2s(data, key=KEY, person=PERSONAL).digest()


def digest_to_bytes(words) -> bytes:
    """(8,) uint32 digest words -> 32 bytes (LE words, standard blake2s)."""
    return np.asarray(words, dtype="<u4").tobytes()
