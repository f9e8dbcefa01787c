"""FRI prover (by values + by coefficients), query producer, verifier.

The fold recurrence per round i over values v of length K
(src/fri/fri_on_values.rs:61-119):

    next[j] = (v[j] + v[j+K/2] + c * w^{-j*2^i} * (v[j] - v[j+K/2])) / 2

with w the FULL lde-domain generator; each round Merkle-commits `next`
and derives the next challenge from the root. On TPU a round is one
fused elementwise kernel over the halved array plus a device Merkle
build; the Fiat-Shamir root -> challenge step is the only host sync.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..domain import (
    Domain,
    coset_for_natural_index_and_size,
    index_and_size_for_next_domain,
    log2_floor,
)
from ..errors import InvalidValueError, SynthesisError
from ..field.field import Field
from ..field.limbs import LimbOps, ops_for
from ..merkle.tree import IopQuery, MerkleTree, digest_to_bytes, verify_path
from ..ntt import intt, lde


@dataclasses.dataclass
class FRIProofPrototype:
    """All intermediate commitments/values (reference FRIProofPrototype,
    src/fri/mod.rs:106-125). Values stay on device in Montgomery form."""

    l0_commitment: MerkleTree
    intermediate_commitments: List[MerkleTree]
    intermediate_values: List[jnp.ndarray]  # each (K, L) Montgomery
    challenges: List[int]
    final_root: bytes
    final_coefficients: List[int]
    initial_degree_plus_one: int
    output_coeffs_at_degree_plus_one: int
    lde_factor: int

    def get_roots(self) -> List[bytes]:
        return [self.l0_commitment.get_root()] + [
            c.get_root() for c in self.intermediate_commitments
        ]

    def get_final_root(self) -> bytes:
        return self.final_root

    def get_final_coefficients(self) -> List[int]:
        return list(self.final_coefficients)


@dataclasses.dataclass
class FRIProof:
    """Queries + roots + final coefficients (reference FRIProof,
    src/fri/mod.rs:139-153)."""

    queries: List[IopQuery]
    roots: List[bytes]
    final_coefficients: List[int]
    initial_degree_plus_one: int
    output_coeffs_at_degree_plus_one: int
    lde_factor: int


# test hook: None = auto (real TPU only); "interpret" forces the fused
# Pallas fold kernel in interpret mode so CPU tests can cover it
_FORCE_PALLAS = None


# jnp-path fold chunking (see _fold_round_body): slice size and the
# minimum half-size at which slicing engages
_FOLD_CHUNK = 1 << 18
_FOLD_CHUNK_MIN = 1 << 21


def _fold_round_body(ops: LimbOps, values, challenge_limbs, stride: int, omegas_inv):
    """One FRI fold (src/fri/fri_on_values.rs:70-105). values: (K, L).

    On TPU the whole round runs as ONE fused Pallas kernel
    (field/pallas_kernels.pallas_fri_fold) instead of 5 separate
    add/sub/mul launches; identical canonical limbs (Montgomery ops are
    exact mod p, association is free)."""
    k = values.shape[0]
    half = k // 2
    lo, hi = values[:half], values[half:]
    if isinstance(omegas_inv, int):
        # omegas_inv = log2 of the chain's l0 domain (STATIC): build this
        # round's twiddles IN-GRAPH as a temp — w_j = W^(-j*stride) via
        # the chunked powers chain — instead of keeping the full (N/2, L)
        # table device-resident (0.5-1 GiB at configs[3], right at the
        # ladder's HBM peak) or embedding it in the program payload (the
        # closed-over form blew the compile service's upload limit).
        # Identical values: powers of W^-stride ARE the strided table.
        dom = Domain.new_for_size(ops.field, 1 << omegas_inv)
        base = pow(dom.generator_inv, stride, ops.field.p)
        w = ops.powers(ops.const(base), half)
    else:
        w = omegas_inv[::stride][:half]

    from ..field.limbs import _pallas_enabled

    use_pallas = _FORCE_PALLAS == "interpret" or (
        _FORCE_PALLAS is None and _pallas_enabled("fri_fold")
    )
    if use_pallas and (half * 1) % 4096 == 0 and half > 0:
        from ..field.pallas_kernels import pallas_fri_fold

        c_scaled = ops.mul(challenge_limbs, ops.two_inv_m, allow_pallas=False)
        return pallas_fri_fold(
            ops.field, lo, hi, w, c_scaled, ops.two_inv_m,
            interpret=_FORCE_PALLAS == "interpret",
        )
    def _elementwise(args):
        lo_c, hi_c, w_c = args
        v_even = ops.add(lo_c, hi_c)
        v_odd = ops.mul(ops.sub(lo_c, hi_c), w_c)
        return ops.mul(
            ops.add(v_even, ops.mul(v_odd, challenge_limbs)), ops.two_inv_m
        )

    # Above _FOLD_CHUNK_MIN rows, run the mul chain in sequential row
    # slices (lax.map): the limb-convolution graph keeps several (N,
    # wide)-shaped intermediates live at once — measured 8.6 GiB temp
    # for a 2^22 fold on the jnp path (BASELINE.md §memory) — and
    # chunking caps that at one slice's worth. Protocol-invisible.
    if half >= _FOLD_CHUNK_MIN and half % _FOLD_CHUNK == 0:
        s = half // _FOLD_CHUNK
        L = values.shape[-1]
        shape = (s, _FOLD_CHUNK, L)
        return jax.lax.map(
            _elementwise,
            (lo.reshape(shape), hi.reshape(shape), w.reshape(shape)),
        ).reshape(half, L)
    return _elementwise((lo, hi, w))


_fold_round = partial(jax.jit, static_argnums=(0, 3))(_fold_round_body)


def _maybe_drop_tree(values, leaf_hashes, levels, drop_min: int):
    """Keep the full tree only below the drop threshold; above it the
    build outputs just the root so the levels are program temporaries
    (HBM budget for configs[3]; merkle.tree.tree_drop_min)."""
    if values.shape[0] >= drop_min:
        return ()
    return (leaf_hashes, tuple(levels))


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _fri_chain(ops: LimbOps, lde_values, num_steps: int, omegas_inv, drop_min: int = 1 << 62):
    """The ENTIRE FRI prover ladder as one device program: commit l0,
    then per round fold -> leaf hash -> all tree levels -> root ->
    next challenge, with the root->field challenge derivation done ON
    DEVICE (digest_to_challenge_mont). Valid because FRI fold challenges
    come straight from each round's root and never touch the transcript
    (src/fri/fri_on_values.rs:106-109, :122-127); the only host syncs
    left are one stacked-roots fetch and the final-coefficients decode.

    Returns (trees, roots_stacked, intermediate_values, final_coeffs):
    trees = tuple of (leaf_hashes, levels) per committed vector
    (l0 first), roots_stacked (num_trees, 8) uint32."""
    from ..merkle.blake2s import digest_to_challenge_mont
    from ..merkle.tree import _build_levels

    trees = []
    roots = []
    values = lde_values
    leaf_hashes, levels = _build_levels(values)
    trees.append(_maybe_drop_tree(values, leaf_hashes, levels, drop_min))
    roots.append(levels[-1][0])
    challenge = digest_to_challenge_mont(ops, levels[-1][0])

    intermediate = []
    for i in range(num_steps):
        folded = _fold_round_body(ops, values, challenge, 1 << i, omegas_inv)
        lh, lv = _build_levels(folded)
        trees.append(_maybe_drop_tree(folded, lh, lv, drop_min))
        roots.append(lv[-1][0])
        challenge = digest_to_challenge_mont(ops, lv[-1][0])
        intermediate.append(folded)
        values = folded

    final_coeffs = intt(ops, values)
    return tuple(trees), jnp.stack(roots), tuple(intermediate), final_coeffs


# cache of jitted group programs: keyed by everything that shapes the
# trace, so repeat proves REUSE the jits (a per-call jax.jit closure
# would retrace + re-lookup ~85 programs per prove - part of the eager
# ladder's 809 s pathology)
_GROUP_CACHE: dict = {}


def _fri_chain_grouped(ops: LimbOps, lde_values, num_steps: int, log_dom: int,
                       drop_min: int):
    """Middle ground between the one-program ladder (XLA temp assignment
    spans all rounds -> runtime OOM at h1=2^24 beside ~7 GiB of prove
    residents) and the per-round eager ladder (~2 programs per round ->
    ~85 executable loads churning the tunnel at ~8 s each, run5i):
    a HANDFUL of programs, each covering a slice of consecutive rounds
    whose summed fold+commit footprint fits a budget. Outputs and
    challenge chain are identical to _fri_chain (field ops exact)."""
    import os as _os

    from ..merkle.blake2s import digest_to_challenge_mont
    from ..merkle.tree import _build_levels

    n = lde_values.shape[0]
    budget = 1 << int(_os.environ.get("HODOR_FRI_GROUP_LOG", "23"))
    key = (ops.field, n, num_steps, drop_min, budget)
    if key not in _GROUP_CACHE:
        groups, cur, cost = [], [], 0
        for i in range(num_steps):
            size = n >> (i + 1)
            if cur and cost + size > budget:
                groups.append(tuple(cur))
                cur, cost = [], 0
            cur.append(i)
            cost += size
        if cur:
            groups.append(tuple(cur))

        @jax.jit
        def _l0(v):
            lh, lv = _build_levels(v)
            tree = () if n >= drop_min else (lh, tuple(lv))
            return tree, lv[-1][0], digest_to_challenge_mont(ops, lv[-1][0])

        def _make_group(rounds):
            @jax.jit
            def _g(v, ch):
                outs = []
                for i in rounds:
                    v = _fold_round_body(ops, v, ch, 1 << i, log_dom)
                    lh, lv = _build_levels(v)
                    tree = () if v.shape[0] >= drop_min else (lh, tuple(lv))
                    ch = digest_to_challenge_mont(ops, lv[-1][0])
                    outs.append((v, tree, lv[-1][0]))
                return outs, ch
            return _g

        _GROUP_CACHE[key] = (_l0, [_make_group(g) for g in groups], groups)
    l0_fn, group_fns, groups = _GROUP_CACHE[key]

    trees, roots, intermediate = [], [], []
    tree, root, challenge = l0_fn(lde_values)
    trees.append(tree)
    roots.append(root)
    values = lde_values
    for gf in group_fns:
        outs, challenge = gf(values, challenge)
        for v, tree, root in outs:
            trees.append(tree)
            roots.append(root)
            intermediate.append(v)
        values = outs[-1][0]
    final_coeffs = jax.jit(lambda v: intt(ops, v))(values)
    return tuple(trees), jnp.stack(roots), tuple(intermediate), final_coeffs


def _fri_chain_eager(ops: LimbOps, lde_values, num_steps: int, omegas_inv,
                     drop_min: int):
    """OOM escape hatch (HODOR_FRI_EAGER=1): the same ladder as
    _fri_chain but one jitted program PER ROUND, so XLA's temp buffer
    assignment never spans the whole ladder — live HBM is capped at one
    round's fold + tree build. Costs one dispatch per round (~30 ms each
    over the axon tunnel) and per-shape compiles on first use; identical
    outputs, same pytree as _fri_chain."""
    from ..merkle.blake2s import digest_to_challenge_mont
    from ..merkle.tree import _build_levels

    @jax.jit
    def _commit(v):
        lh, lv = _build_levels(v)
        return lh, tuple(lv), digest_to_challenge_mont(ops, lv[-1][0])

    @jax.jit
    def _commit_drop(v):
        # root-only variant for tree-dropped sizes: _commit RETURNS the
        # full tree, so in eager mode every round's 0.5-1 GiB of leaf
        # hashes + levels stayed live as program outputs across the
        # async dispatch pipeline (tree-dropping never engaged) — the
        # runtime exhaustion of run5g steps 4-6. Here the levels are
        # program TEMPS; only the 8-word root leaves.
        lh, lv = _build_levels(v)
        return lv[-1][0], digest_to_challenge_mont(ops, lv[-1][0])

    # omegas_inv is an ARGUMENT, never a closure capture: a closed-over
    # device array is embedded in the program payload as a literal, and
    # the h1/h2 tables are 0.5-1 GiB at configs[3] scale — the remote
    # compile service rejects the upload (HTTP 413 "length limit
    # exceeded", surfacing as Broken pipe; run5f/5g steps 1-2).
    @partial(jax.jit, static_argnums=(2, 3))
    def _fold(v, ch, om, stride):
        return _fold_round_body(ops, v, ch, stride, om)

    def commit(v):
        if v.shape[0] >= drop_min:
            root, ch = _commit_drop(v)
            return (), root, ch
        lh, lv, ch = _commit(v)
        return (lh, tuple(lv)), lv[-1][0], ch

    trees, roots, intermediate = [], [], []
    values = lde_values
    tree, root, challenge = commit(values)
    trees.append(tree)
    roots.append(root)
    for i in range(num_steps):
        folded = _fold(values, challenge, omegas_inv, 1 << i)
        tree, root, challenge = commit(folded)
        trees.append(tree)
        roots.append(root)
        intermediate.append(folded)
        values = folded
    final_coeffs = jax.jit(lambda v: intt(ops, v))(values)
    return tuple(trees), jnp.stack(roots), tuple(intermediate), final_coeffs


def _eager_mode() -> bool:
    import os

    return os.environ.get("HODOR_FRI_EAGER", "0") == "1"


def _chain_mode(n: int) -> str:
    """one | eager | grouped. Default: the one-program form below 2^23
    (fastest: 455 ms pair at the 2^18 shapes), grouped above (the
    one-program form exhausts HBM at runtime beside configs[3]
    residents; per-round eager churns ~85 program loads). Overrides:
    HODOR_FRI_MODE=one|eager|grouped, HODOR_FRI_EAGER=1 (legacy)."""
    import os

    mode = os.environ.get("HODOR_FRI_MODE")
    if mode in ("one", "eager", "grouped"):
        return mode
    if _eager_mode():
        return "eager"
    return "grouped" if n >= (1 << 23) else "one"


@partial(jax.jit, static_argnums=(0, 2, 3, 5, 6, 7))
def _fri_chain_pair(ops, lde1, steps1, om1, lde2, steps2, om2, drop_min: int = 1 << 62):
    """Both FRI ladders (h1 and h2) in ONE device program. The chains
    are data-independent (each round's fold challenge derives from its
    own Merkle root on device, never the shared transcript -
    src/fri/fri_on_values.rs:106-127), so XLA can interleave them and
    the prover pays one dispatch + one stacked host fetch instead of
    two of each."""
    return (
        _fri_chain.__wrapped__(ops, lde1, steps1, om1, drop_min),
        _fri_chain.__wrapped__(ops, lde2, steps2, om2, drop_min),
    )


def fri_chain_pair_batch(field: Field, h1_b, h2_b, lde_factor: int,
                         output_coeffs_at_degree_plus_one: int, cache: dict):
    """Both FRI ladders for a BATCH of proofs as one vmapped device
    program (prover.prove_batch). h1_b: (B, N1, L), h2_b: (B, N2, L).
    Returns the two chains' raw batched outputs plus
    (initial_degree_plus_one per chain). `cache` memoizes the jitted
    vmapped program per (sizes, steps, drop) so repeat batches reuse it."""
    ops = ops_for(field)
    from ..merkle.tree import tree_drop_min

    sizes = (h1_b.shape[1], h2_b.shape[1])
    oms = tuple(log2_floor(n) for n in sizes)
    idpos = tuple(n // lde_factor for n in sizes)
    steps = tuple(
        log2_floor(d // output_coeffs_at_degree_plus_one) for d in idpos
    )
    drop = tree_drop_min()
    key = (sizes, steps, drop)
    if key not in cache:
        def pair(l1, l2):
            return (
                _fri_chain.__wrapped__(ops, l1, steps[0], oms[0], drop),
                _fri_chain.__wrapped__(ops, l2, steps[1], oms[1], drop),
            )

        cache[key] = jax.jit(jax.vmap(pair))
    return cache[key](h1_b, h2_b), idpos


@jax.jit
def _gather_chain_queries(chain_data, idx_arrays):
    """One fused gather of every round's query values + full Merkle
    paths (replaces per-level device_gets; src/fri/query_producer.rs
    walks the same (tree, coset) chain). chain_data: list of
    (leaf_hashes, levels_tuple, committed_values); idx_arrays: list of
    (Q,) int32 tree indices per round. Returns per round
    (values (Q, L), sibling digests (depth, Q, 8))."""
    from ..merkle.tree import _build_levels

    out = []
    for (lh, levels, vals), idx in zip(chain_data, idx_arrays):
        if lh is None:
            # DROPPED tree (merkle.tree.tree_drop_min): rebuild from the
            # committed values inside this program — the level arrays are
            # temporaries, live only for their own gather, so peak HBM is
            # one tree at a time instead of every tree resident
            lh, levels = _build_levels(vals)
            levels = tuple(levels)
        v = jnp.take(vals, idx, axis=0)
        sibs = [jnp.take(lh, idx ^ 1, axis=0)]
        cur = idx >> 1
        for level in levels[:-1]:
            sibs.append(jnp.take(level, cur ^ 1, axis=0))
            cur = cur >> 1
        out.append((v, jnp.stack(sibs, axis=0)))
    return out


class NaiveFriIop:
    """Reference NaiveFriIop<F, TrivialBlake2sIOP> (src/fri/mod.rs:64-104)."""

    DEGREE = 2

    # --------------------------------------------------------- prover

    @staticmethod
    def proof_from_lde(lde_values, lde_factor: int, output_coeffs_at_degree_plus_one: int,
                       field: Field) -> FRIProofPrototype:
        return NaiveFriIop.proof_from_lde_by_values(
            lde_values, lde_factor, output_coeffs_at_degree_plus_one, field
        )

    @staticmethod
    def proof_from_lde_by_values(
        lde_values, lde_factor: int, output_coeffs_at_degree_plus_one: int, field: Field
    ) -> FRIProofPrototype:
        """lde_values: (N, L) Montgomery device array.
        Port of src/fri/fri_on_values.rs:11-163 - but the whole ladder
        (folds, Merkle trees, root->challenge) runs as ONE device program
        (_fri_chain); host work is a single stacked-roots fetch plus the
        final-coefficients decode."""
        ops = ops_for(field)
        n = lde_values.shape[0]
        assert output_coeffs_at_degree_plus_one & (output_coeffs_at_degree_plus_one - 1) == 0
        assert lde_factor & (lde_factor - 1) == 0

        # static log of the l0 domain: each fold round builds its own
        # in-graph twiddle temp (see _fold_round_body)
        omegas_inv = log2_floor(n)

        initial_degree_plus_one = n // lde_factor
        num_steps = log2_floor(initial_degree_plus_one // output_coeffs_at_degree_plus_one)

        from ..merkle.tree import tree_drop_min

        mode = _chain_mode(n)
        chain = {"eager": _fri_chain_eager, "grouped": _fri_chain_grouped,
                 "one": _fri_chain}[mode]
        trees, roots_dev, intermediate_values, final_coeffs_dev = chain(
            ops, lde_values, num_steps, omegas_inv, tree_drop_min()
        )
        roots_np, coeffs_np = jax.device_get((roots_dev, final_coeffs_dev))
        return NaiveFriIop._assemble_prototype(
            ops, field, trees, np.asarray(roots_np), intermediate_values,
            np.asarray(coeffs_np), initial_degree_plus_one,
            output_coeffs_at_degree_plus_one, lde_factor,
        )

    @staticmethod
    def proofs_from_lde_pair(
        lde1, lde2, lde_factor: int, output_coeffs_at_degree_plus_one: int, field: Field
    ):
        """FRI prototypes for TWO polynomials (the prover's h1/h2) from a
        single device program + a single batched host fetch (roots and
        final coefficients of both chains in one transfer)."""
        ops = ops_for(field)

        sizes = (lde1.shape[0], lde2.shape[0])
        oms = tuple(log2_floor(n) for n in sizes)
        idpos = tuple(n // lde_factor for n in sizes)
        steps = tuple(
            log2_floor(d // output_coeffs_at_degree_plus_one) for d in idpos
        )
        from ..merkle.tree import tree_drop_min

        mode = _chain_mode(max(sizes))
        if mode == "one":
            (trees1, roots1, inter1, fc1), (trees2, roots2, inter2, fc2) = _fri_chain_pair(
                ops, lde1, steps[0], oms[0], lde2, steps[1], oms[1], tree_drop_min()
            )
        else:
            chain = _fri_chain_eager if mode == "eager" else _fri_chain_grouped
            (trees1, roots1, inter1, fc1) = chain(
                ops, lde1, steps[0], oms[0], tree_drop_min()
            )
            (trees2, roots2, inter2, fc2) = chain(
                ops, lde2, steps[1], oms[1], tree_drop_min()
            )
        r1, c1, r2, c2 = jax.device_get((roots1, fc1, roots2, fc2))  # ONE sync
        protos = []
        for trees, roots_np, inter, coeffs_np, idpo in (
            (trees1, r1, inter1, c1, idpos[0]),
            (trees2, r2, inter2, c2, idpos[1]),
        ):
            protos.append(
                NaiveFriIop._assemble_prototype(
                    ops, field, trees, np.asarray(roots_np), inter,
                    np.asarray(coeffs_np), idpo,
                    output_coeffs_at_degree_plus_one, lde_factor,
                )
            )
        return protos[0], protos[1]

    @staticmethod
    def _assemble_prototype(
        ops, field, trees, roots_np, intermediate_values, final_coeffs_np,
        initial_degree_plus_one, output_coeffs_at_degree_plus_one, lde_factor,
    ) -> FRIProofPrototype:
        """Host-side prototype assembly from fetched chain outputs."""
        root_bytes = [digest_to_bytes(r) for r in roots_np]

        def mk(tree, rb, size):
            if len(tree) == 0:  # dropped above tree_drop_min: root only
                return MerkleTree(None, None, field, root_bytes=rb, size=size)
            return MerkleTree(tree[0], list(tree[1]), field, root_bytes=rb)

        n0 = initial_degree_plus_one * lde_factor
        l0 = mk(trees[0], root_bytes[0], n0)
        intermediate_commitments = [
            mk(tree, rb, n0 >> (i + 1))
            for i, (tree, rb) in enumerate(zip(trees[1:], root_bytes[1:]))
        ]
        # all tree challenges except the last tree's (the final fold draws
        # none, fri_on_values.rs:122); num_steps == 0 leaves it empty
        challenges = [field.from_be_with_shave(rb) for rb in root_bytes[:-1]]
        roots = root_bytes[1:]
        final_root = roots[-1] if roots else root_bytes[0]

        final_coeffs = [int(v) for v in ops.decode(final_coeffs_np)][
            :output_coeffs_at_degree_plus_one
        ]
        intermediate_values = list(intermediate_values)

        return FRIProofPrototype(
            l0_commitment=l0,
            intermediate_commitments=intermediate_commitments,
            intermediate_values=intermediate_values,
            challenges=challenges,
            final_root=final_root,
            final_coefficients=final_coeffs,
            initial_degree_plus_one=initial_degree_plus_one,
            output_coeffs_at_degree_plus_one=output_coeffs_at_degree_plus_one,
            lde_factor=lde_factor,
        )

    @staticmethod
    def proof_from_lde_through_coefficients(
        lde_values, lde_factor: int, output_coeffs_at_degree_plus_one: int, field: Field
    ) -> FRIProofPrototype:
        """Test cross-check prover (src/fri/mod.rs:156-249): fold in
        coefficient space, re-LDE and commit each round."""
        ops = ops_for(field)
        n = lde_values.shape[0]
        l0 = MerkleTree.create(lde_values, field)
        initial_degree_plus_one = n // lde_factor
        num_steps = log2_floor(initial_degree_plus_one // output_coeffs_at_degree_plus_one)

        coeffs = intt(ops, lde_values)[:initial_degree_plus_one]
        challenges = [l0.get_challenge_scalar_from_root()]
        intermediate_commitments: List[MerkleTree] = []
        intermediate_values: List[jnp.ndarray] = []
        roots: List[bytes] = []

        for _ in range(num_steps):
            c = ops.const(challenges[-1])
            # next[j] = a_{2j} + challenge * a_{2j+1}
            even, odd = coeffs[0::2], coeffs[1::2]
            coeffs = ops.add(even, ops.mul(odd, c))
            values = lde(ops, coeffs, lde_factor)
            tree = MerkleTree.create(values, field)
            roots.append(tree.get_root())
            challenges.append(tree.get_challenge_scalar_from_root())
            intermediate_commitments.append(tree)
            intermediate_values.append(values)

        challenges.pop()
        final_root = roots[-1] if roots else l0.get_root()
        final_coeffs = [int(v) for v in ops.decode(coeffs)]
        assert len(final_coeffs) == output_coeffs_at_degree_plus_one

        return FRIProofPrototype(
            l0_commitment=l0,
            intermediate_commitments=intermediate_commitments,
            intermediate_values=intermediate_values,
            challenges=challenges,
            final_root=final_root,
            final_coefficients=final_coeffs,
            initial_degree_plus_one=initial_degree_plus_one,
            output_coeffs_at_degree_plus_one=output_coeffs_at_degree_plus_one,
            lde_factor=lde_factor,
        )

    # --------------------------------------------------- query producer

    @staticmethod
    def _query_plan(prototype: FRIProofPrototype, iop_values, natural_first_element_index: int):
        """Chain-walk bookkeeping for the query producer
        (src/fri/query_producer.rs:10-53): per round the (tree, values)
        pair plus the coset indices to open. Returns (trees, cosets,
        chain_data, idx_arrays) - the device gather itself is left to the
        caller so several polynomials' plans can share ONE program."""
        domain_size = prototype.initial_degree_plus_one * prototype.lde_factor
        domain_idx = natural_first_element_index

        trees = [prototype.l0_commitment] + list(prototype.intermediate_commitments)
        values = [iop_values] + list(prototype.intermediate_values)

        chain_data = []
        idx_arrays = []
        cosets = []
        for tree, vals in zip(trees, values):
            coset = coset_for_natural_index_and_size(domain_idx, domain_size)
            cosets.append(coset)
            chain_data.append(
                (None, None, vals) if tree.dropped
                else (tree.leaf_hashes, tuple(tree.levels), vals)
            )
            idx_arrays.append(jnp.asarray(np.asarray(coset, dtype=np.int32)))
            domain_idx, domain_size = index_and_size_for_next_domain(domain_idx, domain_size)
        return trees, cosets, chain_data, idx_arrays

    @staticmethod
    def _proof_from_gathered(
        prototype: FRIProofPrototype, trees, cosets, gathered, ops
    ) -> FRIProof:
        """Assemble an FRIProof from fetched (values, sibling-paths)."""
        from ..merkle.tree import digest_to_bytes

        queries: List[IopQuery] = []
        roots: List[bytes] = []
        for tree, coset, (v, sibs) in zip(trees, cosets, gathered):
            vals_dec = ops.decode(v)  # (Q,) canonical ints
            for qi, idx in enumerate(coset):
                path = [digest_to_bytes(sibs[d, qi]) for d in range(sibs.shape[0])]
                queries.append(IopQuery(index=idx, value=int(vals_dec[qi]), path=path))
            roots.append(tree.get_root())

        return FRIProof(
            queries=queries,
            roots=roots,
            final_coefficients=prototype.get_final_coefficients(),
            initial_degree_plus_one=prototype.initial_degree_plus_one,
            output_coeffs_at_degree_plus_one=prototype.output_coeffs_at_degree_plus_one,
            lde_factor=prototype.lde_factor,
        )

    @staticmethod
    def prototype_into_proof(
        prototype: FRIProofPrototype, iop_values, natural_first_element_index: int, field: Field
    ) -> FRIProof:
        """Walk all rounds producing coset queries
        (src/fri/query_producer.rs:10-53). iop_values is the (N, L) device
        array committed in l0. All rounds' values + full Merkle paths are
        gathered in ONE device program + ONE transfer."""
        ops = ops_for(field)
        trees, cosets, chain_data, idx_arrays = NaiveFriIop._query_plan(
            prototype, iop_values, natural_first_element_index
        )
        gathered = jax.device_get(_gather_chain_queries(chain_data, idx_arrays))
        return NaiveFriIop._proof_from_gathered(prototype, trees, cosets, gathered, ops)

    # --------------------------------------------------------- verifier

    @staticmethod
    def verify_proof(proof: FRIProof, natural_element_index: int, expected_value: int,
                     field: Field) -> bool:
        return NaiveFriIop.verify_proof_queries(
            proof, natural_element_index, NaiveFriIop.DEGREE, expected_value, field
        )

    @staticmethod
    def verify_proof_queries(
        proof: FRIProof, natural_element_index: int, degree: int, expected_value: int,
        field: Field
    ) -> bool:
        """Host scalar re-fold per query (src/fri/verifier.rs:131-289)."""
        p = field.p
        two_inv = field.inv(2)
        domain = Domain.new_for_size(field, proof.initial_degree_plus_one * proof.lde_factor)
        domain_element = field.pow(domain.generator, natural_element_index)
        if field.pow(domain_element, domain.size) != 1:
            raise InvalidValueError("challenge element not in LDE domain")
        if field.pow(domain_element, domain.size // 2) == 1:
            raise InvalidValueError("challenge element not in LDE domain")

        omega = domain.generator
        omega_inv = field.inv(omega)
        expected = None
        domain_size = domain.size
        domain_idx = natural_element_index

        if len(proof.queries) % degree != 0:
            raise InvalidValueError("invalid number of queries")

        def horner(x):
            acc, power = 0, 1
            for c in proof.final_coefficients:
                acc = (acc + power * c) % p
                power = power * x % p
            return acc

        last_round = len(proof.roots) - 1
        for round_idx, root in enumerate(proof.roots):
            qs = proof.queries[round_idx * degree : (round_idx + 1) * degree]
            coset = coset_for_natural_index_and_size(domain_idx, domain_size)
            if len(coset) != 2:
                raise InvalidValueError("invalid coset size")
            for q in qs:
                if q.natural_index not in coset:
                    return False
            if round_idx == 0:
                for q in qs:
                    if q.natural_index == natural_element_index and q.value != expected_value:
                        return False
            for c, q in zip(coset, qs):
                if q.tree_index != c:
                    raise InvalidValueError("invalid tree index")
            for q in qs:
                if not verify_path(root, q.value, q.path, q.tree_index, field):
                    return False

            if expected is not None:
                if domain_idx not in coset:
                    return False
                matching = [q for q in qs if q.natural_index == domain_idx]
                if len(matching) != 1 or matching[0].value != expected:
                    return False

            if round_idx == last_round:
                # The last committed vector IS the claimed low-degree
                # polynomial: check every queried point directly against
                # the committed coefficients. (The reference's query
                # verifier instead folds once more and compares the fold
                # output to the coefficients - correct only for
                # output degree 1, where a constant is a fixed point of
                # folding; its prototype verifier src/fri/verifier.rs:10-129
                # does the num_steps-fold form generalized here. For the
                # reference's only exercised configuration, output=1, this
                # check is strictly stronger: both coset values must equal
                # the constant, not just their fold combination.)
                for c, q in zip(coset, qs):
                    if q.value != horner(field.pow(omega, c)):
                        return False
                return True

            challenge = field.from_be_with_shave(root)
            f_at_omega = qs[0].value
            f_at_minus_omega = qs[1].value
            divisor = field.pow(omega_inv, coset[0])
            v_even = (f_at_omega + f_at_minus_omega) % p
            v_odd = (f_at_omega - f_at_minus_omega) * divisor % p
            expected = (v_even + challenge * v_odd) * two_inv % p

            domain_idx, domain_size = index_and_size_for_next_domain(domain_idx, domain_size)
            omega = field.mul(omega, omega)
            omega_inv = field.mul(omega_inv, omega_inv)

        raise InvalidValueError("no FRI rounds present")

    @staticmethod
    def verify_prototype(prototype: FRIProofPrototype, leaf_values, natural_element_index: int,
                         field: Field) -> bool:
        """Full-values verifier for tests (src/fri/verifier.rs:10-129)."""
        ops = ops_for(field)
        p = field.p
        two_inv = field.inv(2)
        domain = Domain.new_for_size(field, prototype.initial_degree_plus_one * prototype.lde_factor)
        omega = domain.generator
        omega_inv = field.inv(omega)
        expected = None
        domain_size = domain.size
        domain_idx = natural_element_index

        all_values = [leaf_values] + list(prototype.intermediate_values)
        for vals, challenge in zip(all_values, prototype.challenges):
            coset = coset_for_natural_index_and_size(domain_idx, domain_size)
            f_at_omega = int(ops.decode(vals[coset[0]]))
            if expected is not None:
                if domain_idx not in coset:
                    return False
                supplied = int(ops.decode(vals[domain_idx]))
                if supplied != expected:
                    return False
            f_at_minus_omega = int(ops.decode(vals[coset[1]]))
            divisor = field.pow(omega_inv, coset[0])
            v_even = (f_at_omega + f_at_minus_omega) % p
            v_odd = (f_at_omega - f_at_minus_omega) * divisor % p
            expected = (v_even + challenge * v_odd) * two_inv % p
            domain_idx, domain_size = index_and_size_for_next_domain(domain_idx, domain_size)
            omega = field.mul(omega, omega)
            omega_inv = field.mul(omega_inv, omega_inv)

        point = field.pow(omega, domain_idx)
        acc, power = 0, 1
        for c in prototype.final_coefficients:
            acc = (acc + power * c) % p
            power = power * point % p
        return acc == expected
