"""Blake2s + Merkle tree tests.

Device-vectorized Blake2s is checked bit-exactly against hashlib's keyed
blake2s (the same construction blake2s_simd implements for the reference,
src/iop/blake2s_trivial_iop.rs:8-16). Tree round-trip mirrors
make_small_iop (src/iop/blake2s_trivial_iop.rs:392-408).
"""

import hashlib
import random

import jax
import numpy as np

from hodor_tpu.field import F257, F_STARK, ops_for
from hodor_tpu.merkle import MerkleTree, verify_path
from hodor_tpu.merkle.blake2s import (
    KEY,
    PERSONAL,
    digest_to_bytes,
    hash_leaves,
    hash_nodes,
    limbs_to_leaf_words,
)
from hodor_tpu.transcript import Blake2sTranscript


def ref_hash(data: bytes) -> bytes:
    return hashlib.blake2s(data, key=KEY, person=PERSONAL).digest()


def test_vector_blake2s_leaf_vs_hashlib():
    msgs = [bytes([i] * 32) for i in range(16)] + [bytes(range(32))]
    words = jax.numpy.asarray(
        np.stack([np.frombuffer(m, dtype="<u4") for m in msgs])
    )
    digests = jax.jit(hash_leaves)(words)
    for i, m in enumerate(msgs):
        assert digest_to_bytes(jax.device_get(digests[i])) == ref_hash(m)


def test_vector_blake2s_node_vs_hashlib():
    lefts = [bytes([i] * 32) for i in range(8)]
    rights = [bytes([100 + i] * 32) for i in range(8)]
    lw = jax.numpy.asarray(np.stack([np.frombuffer(m, dtype="<u4") for m in lefts]))
    rw = jax.numpy.asarray(np.stack([np.frombuffer(m, dtype="<u4") for m in rights]))
    digests = jax.jit(hash_nodes)(lw, rw)
    for i in range(8):
        assert digest_to_bytes(jax.device_get(digests[i])) == ref_hash(lefts[i] + rights[i])


def test_leaf_encoding_is_raw_montgomery_le():
    field = F_STARK
    ops = ops_for(field)
    xs = [0, 1, 12345, field.p - 1]
    limbs = ops.encode(xs)
    words = limbs_to_leaf_words(limbs)
    for i, x in enumerate(xs):
        expect = field.raw_repr_le(x).ljust(32, b"\x00")
        assert np.asarray(jax.device_get(words[i]), dtype="<u4").tobytes() == expect


def test_merkle_roundtrip_all_queries():
    field = F_STARK
    ops = ops_for(field)
    size = 64
    values = [pow(2, i, field.p) for i in range(size)]  # like make_small_iop
    limbs = ops.encode(values)
    tree = MerkleTree.create(limbs, field)
    root = tree.get_root()
    vals_arr = np.array(values, dtype=object)
    for i in range(size):
        q = tree.query(i, vals_arr)
        assert q.value == values[i]
        assert verify_path(root, q.value, q.path, q.tree_index, field)
        # tampered value must fail
        assert not verify_path(root, (q.value + 1) % field.p, q.path, q.tree_index, field)


def test_root_challenge_shave():
    field = F257
    ops = ops_for(field)
    tree = MerkleTree.create(ops.encode([1] * 16), field)
    c = tree.get_challenge_scalar_from_root()
    # decode oracle: first repr_size bytes BE, mask top limb to CAPACITY bits
    root = tree.get_root()
    v = int.from_bytes(root[:8], "big") & (0xFFFFFFFFFFFFFFFF >> ((256 - field.capacity) % 64))
    assert c == v and c < field.p


def test_transcript_matches_rust_semantics():
    field = F257
    t = Blake2sTranscript(field)
    t.commit_bytes(b"root0")
    t.commit_field_element(123)
    # commit_field_element writes BE canonical repr of repr_size bytes
    buf = b"root0" + (123).to_bytes(8, "big")
    d = hashlib.blake2s(buf, key=KEY, person=PERSONAL).digest()
    assert t.get_challenge_bytes() == d
    # state absorbed the digest; next challenge hashes buf+d
    d2 = hashlib.blake2s(buf + d, key=KEY, person=PERSONAL).digest()
    c = t.get_challenge()
    assert c == int.from_bytes(d2[:8], "big") & 0xFF


def test_digest_to_challenge_mont_matches_host():
    """The on-device root->challenge map (digest_to_challenge_mont,
    used for Fiat-Shamir-free FRI fold challenges inside _fri_chain)
    must agree with the host Field.from_be_with_shave on the digest
    bytes (src/iop/blake2s_trivial_iop.rs:226-234) for every field."""
    import numpy as np

    from hodor_tpu.field import F_BLS
    from hodor_tpu.merkle.blake2s import digest_to_challenge_mont

    rng = random.Random(99)
    for field in (F257, F_STARK, F_BLS):
        ops = ops_for(field)
        for _ in range(8):
            digest = bytes(rng.randrange(256) for _ in range(32))
            words = np.frombuffer(digest, dtype="<u4").copy()
            host = field.from_be_with_shave(digest)
            dev = int(ops.decode(digest_to_challenge_mont(ops, words)))
            assert dev == host
