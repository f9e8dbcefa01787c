"""Prover orchestration (reference: src/prover/mod.rs).

Precomputes ARP + ALI at construction (amortized across proofs, like
Prover::new, src/prover/mod.rs:46-64); `prove` runs the full pipeline
(witness iNTT -> f LDEs -> f oracles -> G -> G LDE/oracle -> DEEP ->
FRI(h1), FRI(h2) -> queries).

TPU-first structure: the pipeline is grouped into a handful of fused
device programs with a host sync only at each Fiat-Shamir commit point
(the protocol's true sequential dependencies, src/prover/mod.rs:82-127):

  stage 1: witness iNTT + all f LDEs + all f Merkle trees -> stacked roots
  stage G: G composition (ALI jit) + G LDE + G tree         -> root
  DEEP:    one jit                                           -> f(mz), g(z)
  FRI:     whole fold/commit/challenge ladder per poly (one jit each;
           fold challenges never touch the transcript so they derive
           on device, fri/_fri_chain)
  queries: every oracle opening gathered in one device program

An optional `jax.sharding.Mesh` shards the big evaluation-domain axes
across devices (the multi-chip analog of the reference's Worker pool);
sharded and single-device proofs are byte-identical.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ali import ALIInstance
from .arp import ARPInstance, InstanceProperties
from .errors import SynthesisError
from .field.limbs import ops_for
from .fri import FRIProof, NaiveFriIop
from .fri.fri import _gather_chain_queries
from .merkle.tree import IopQuery, MerkleTree, _build_levels, digest_to_bytes
from .ntt import intt, lde
from .transcript import Blake2sTranscript, bytes_to_challenge_index

# h1 sizes at or above this run the query gather as per-oracle programs
# (see the queries stage); env-overridable for tests
import os as _os

_GATHER_SPLIT_MIN = 1 << int(_os.environ.get("HODOR_GATHER_SPLIT_MIN", "23"))


@dataclasses.dataclass
class InstanceProof:
    """Reference InstanceProof (src/verifier/mod.rs:97-116)."""

    f_at_z_m: List[int]
    f_iop_roots: List[bytes]
    g_iop_root: bytes
    f_queries: List[IopQuery]
    g_query: IopQuery
    h1_iop_roots: List[bytes]
    h2_iop_roots: List[bytes]
    fri_proof_h1: FRIProof
    fri_proof_h2: FRIProof


class Prover:
    @staticmethod
    def from_config(properties: InstanceProperties, config) -> "Prover":
        """Construct from a ProofSystemConfig (hodor_tpu/config.py) - the
        runtime analog of the reference's generic parameters."""
        return Prover(
            properties,
            lde_factor=config.lde_factor,
            fri_final_degree_plus_one=config.fri_final_degree_plus_one,
            mesh=config.mesh,
        )

    def __init__(self, properties: InstanceProperties, lde_factor: int,
                 fri_final_degree_plus_one: int, mesh=None):
        self.field = properties.field
        self.ops = ops_for(self.field)
        self.arp = ARPInstance.from_instance(properties)
        self.ali = ALIInstance(self.arp, mesh=mesh)
        self.lde_factor = lde_factor
        self.fri_final_degree_plus_one = fri_final_degree_plus_one
        self.mesh = mesh

        ops = self.ops
        num_registers = properties.num_registers

        def _lde(coeffs):
            # With a mesh, run the LDE genuinely distributed: the COSET
            # axis is sharded so each device computes its own cosets'
            # NTTs with zero communication, and the single all-to-all is
            # the natural-order interleave (parallel/sharded_lde — the
            # multi-chip analog of the reference's parallel LDE,
            # src/polynomials/mod.rs:418-482 over a Worker pool). The
            # round-2 version only ANNOTATED the replicated lde() output
            # and left GSPMD to guess (VERDICT round-2 item 3).
            n_dev = self.mesh.devices.size if self.mesh is not None else 0
            if self.mesh is None or lde_factor % n_dev != 0:
                return lde(ops, coeffs, lde_factor)
            from .parallel import sharded_lde

            return sharded_lde(ops, coeffs, lde_factor, self.mesh)

        def _shard_rows(x):
            # keep downstream per-register work (Merkle leaf hashing,
            # tree levels) sharded on the evaluation axis
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = self.mesh.axis_names[0]
            spec = P(*([None] * (x.ndim - 2)), axis, None)
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec)
            )

        from .merkle.tree import tree_drop_min

        drop_min = tree_drop_min()

        def _oracle(vals):
            # above tree_drop_min only the ROOT leaves the program: the
            # level arrays are XLA temporaries and the query gather
            # rebuilds them from vals (HBM budget, BASELINE.md §memory)
            lh, lv = _build_levels(_shard_rows(vals))
            tree = () if vals.shape[0] >= drop_min else (lh, tuple(lv))
            return tree, lv[-1][0]

        def stage1(witness_dev):
            # witness iNTT (src/prover/mod.rs:69) + f LDEs (:71-76) + all
            # register oracles (:78-80) in one program
            coeffs = intt(ops, witness_dev)  # (R, T, L)
            f_ldes = _lde(coeffs)  # (R, N_f, L) row-sharded under a mesh
            trees = []
            roots = []
            for r in range(num_registers):
                tree, root = _oracle(f_ldes[r])
                trees.append(tree)
                roots.append(root)
            return coeffs, f_ldes, tuple(trees), jnp.stack(roots)

        def stage_g(g_poly):
            # G LDE + oracle (src/prover/mod.rs:91-95)
            g_lde_vals = _lde(g_poly)
            tree, root = _oracle(g_lde_vals)
            return g_lde_vals, tree, root

        self._stage1_fn = jax.jit(stage1)
        self._stage_g_fn = jax.jit(stage_g)
        # raw closures kept for prove_batch's vmapped variants
        self._stage1_raw = stage1
        self._stage_g_raw = stage_g
        self._stage1_batch_fn = None
        self._stage_g_batch_fn = None
        self._fri_batch_cache = {}

    def prove(self, witness: List[List[int]],
              checkpoint_dir: Optional[str] = None) -> InstanceProof:
        """Full prove pipeline (src/prover/mod.rs:66-174).

        checkpoint_dir (optional): persist each completed Fiat-Shamir
        stage (hodor_tpu/checkpoint.py) so an interrupted prove resumes
        from the last stage boundary on re-run with the same directory;
        the resumed proof is byte-identical (tests/test_checkpoint.py).
        Resumed oracles are root-only — the query gather rebuilds their
        trees in-program (the tree-dropping mechanism, merkle/tree.py).
        """
        ops = self.ops
        field = self.field
        ck = None
        done: List[str] = []
        if checkpoint_dir is not None:
            from .checkpoint import ProveCheckpoint

            ck = ProveCheckpoint(checkpoint_dir)
            done = ck.completed_prefix()

        transcript = Blake2sTranscript(field)
        # exposed for Fiat-Shamir audits (tests/test_golden.py)
        self.last_transcript = transcript
        # structured stage timings (SURVEY §5 profiling facility); stage
        # boundaries are host syncs so wall-time is honest per stage
        from .profiling import StageTimer

        timer = StageTimer()
        self.last_timings = timer

        def _restore_transcript(meta):
            nonlocal transcript
            transcript = Blake2sTranscript.restore(field, meta["transcript"])
            self.last_transcript = transcript

        # 1+2. witness -> polys -> LDEs -> oracles (one device program)
        if ck is not None and "stage1" in done:
            with timer.stage("witness+f_ldes+f_oracles(resumed)"):
                arrays, meta = ck.load("stage1")
                witness_polys = jnp.asarray(arrays["witness_polys"])
                f_ldes = jnp.asarray(arrays["f_ldes"])
                f_iop_roots = [bytes.fromhex(h) for h in meta["f_roots"]]
                f_oracles = [
                    MerkleTree(None, None, field, root_bytes=rb,
                               size=f_ldes.shape[1])
                    for rb in f_iop_roots
                ]
                _restore_transcript(meta)
        else:
            with timer.stage("witness+f_ldes+f_oracles"):
                w_dev = self.arp.encode_witness(witness)
                witness_polys, f_ldes, f_trees, f_roots_dev = self._stage1_fn(w_dev)
                w_dev = None  # encoded witness is dead after stage1
                f_roots = np.asarray(jax.device_get(f_roots_dev))  # SYNC: commit roots
            f_iop_roots = [digest_to_bytes(r) for r in f_roots]
            f_oracles = [
                MerkleTree(None, None, field, root_bytes=rb, size=f_ldes.shape[1])
                if len(tree) == 0
                else MerkleTree(tree[0], list(tree[1]), field, root_bytes=rb)
                for tree, rb in zip(f_trees, f_iop_roots)
            ]
            for root in f_iop_roots:
                transcript.commit_bytes(root)
            if ck is not None:
                ck.save(
                    "stage1",
                    {
                        "witness_polys": jax.device_get(witness_polys),
                        "f_ldes": jax.device_get(f_ldes),
                    },
                    {
                        "f_roots": [rb.hex() for rb in f_iop_roots],
                        "transcript": transcript.snapshot(),
                    },
                )

        # 3+4. G composition + G LDE + oracle (src/prover/mod.rs:89-95)
        if ck is not None and "stage_g" in done:
            with timer.stage("g_composition+g_oracle(resumed)"):
                arrays, meta = ck.load("stage_g")
                g_poly = jnp.asarray(arrays["g_poly"])
                g_lde_vals = jnp.asarray(arrays["g_lde_vals"])
                g_iop_root = bytes.fromhex(meta["g_root"])
                g_oracle = MerkleTree(None, None, field, root_bytes=g_iop_root,
                                      size=g_lde_vals.shape[0])
                _restore_transcript(meta)
        else:
            with timer.stage("g_composition+g_oracle"):
                g_poly = self.ali.calculate_g(transcript, witness_polys)  # (D, L)
                g_lde_vals, g_tree, g_root_dev = self._stage_g_fn(g_poly)
                g_iop_root = digest_to_bytes(jax.device_get(g_root_dev))  # SYNC
            g_oracle = (
                MerkleTree(None, None, field, root_bytes=g_iop_root,
                           size=g_lde_vals.shape[0])
                if len(g_tree) == 0
                else MerkleTree(g_tree[0], list(g_tree[1]), field, root_bytes=g_iop_root)
            )
            transcript.commit_bytes(g_iop_root)
            if ck is not None:
                ck.save(
                    "stage_g",
                    {
                        "g_poly": jax.device_get(g_poly),
                        "g_lde_vals": jax.device_get(g_lde_vals),
                    },
                    {
                        "g_root": g_iop_root.hex(),
                        "transcript": transcript.snapshot(),
                    },
                )

        # 5. DEEP (src/prover/mod.rs:99-106)
        if ck is not None and "deep" in done:
            with timer.stage("deep(resumed)"):
                arrays, meta = ck.load("deep")
                h1_lde = jnp.asarray(arrays["h1_lde"])
                h2_lde = jnp.asarray(arrays["h2_lde"])
                f_at_z_m = [int(v) for v in meta["f_at_z_m"]]
                _restore_transcript(meta)
        else:
            with timer.stage("deep"):
                h1_lde, h2_lde, f_at_z_m, _g_at_z = self.ali.calculate_deep(
                    witness_polys, f_ldes, g_poly, g_lde_vals, transcript
                )
            if ck is not None:
                ck.save(
                    "deep",
                    {
                        "h1_lde": jax.device_get(h1_lde),
                        "h2_lde": jax.device_get(h2_lde),
                    },
                    {
                        "f_at_z_m": [str(v) for v in f_at_z_m],
                        "transcript": transcript.snapshot(),
                    },
                )

        # 6. FRI for h1 and h2 (src/prover/mod.rs:112-113); both ladders
        # run in ONE device program with a single batched host fetch
        # (fri/_fri_chain_pair)
        if ck is not None and "fri" in done:
            with timer.stage("fri_h1+h2(resumed)"):
                arrays, meta = ck.load("fri")
                protos = []
                for tag, lde_vals in (("h1", h1_lde), ("h2", h2_lde)):
                    n_rounds = int(meta[f"{tag}_rounds"])
                    inter = [
                        jnp.asarray(arrays[f"{tag}_v{i}"]) for i in range(n_rounds)
                    ]
                    protos.append(
                        NaiveFriIop._assemble_prototype(
                            ops, field,
                            [()] * (n_rounds + 1),  # all trees root-only
                            arrays[f"{tag}_roots"], inter, arrays[f"{tag}_fc"],
                            lde_vals.shape[0] // self.lde_factor,
                            self.fri_final_degree_plus_one, self.lde_factor,
                        )
                    )
                h1_proto, h2_proto = protos
                _restore_transcript(meta)
        else:
            with timer.stage("fri_h1+h2"):
                h1_proto, h2_proto = NaiveFriIop.proofs_from_lde_pair(
                    h1_lde, h2_lde, self.lde_factor, self.fri_final_degree_plus_one,
                    field
                )
            if ck is not None:
                arrays = {}
                meta = {"transcript": transcript.snapshot()}
                for tag, proto in (("h1", h1_proto), ("h2", h2_proto)):
                    inter = proto.intermediate_values
                    meta[f"{tag}_rounds"] = len(inter)
                    for i, v in enumerate(inter):
                        arrays[f"{tag}_v{i}"] = jax.device_get(v)
                    arrays[f"{tag}_roots"] = np.stack(
                        [np.frombuffer(rb, dtype="<u4")  # digest_to_bytes inverse
                         for rb in proto.get_roots()]
                    )
                    arrays[f"{tag}_fc"] = jax.device_get(
                        ops.encode([proto.final_coefficients])
                    )[0]
                ck.save("fri", arrays, meta)

        # Free buffers nothing below reads: witness coefficients and the
        # G coefficient form are dead once DEEP has run (the query gather
        # reads f_ldes/g_lde/h-values only). At configs[3] the gather
        # program compiled 61 MB over HBM with them resident (run5h
        # step_1) - ~0.4 GiB of margin for free.
        witness_polys = None
        g_poly = None

        # 7. commit final roots + coefficients (src/prover/mod.rs:118-127)
        transcript.commit_bytes(h1_proto.get_final_root())
        for el in h1_proto.get_final_coefficients():
            transcript.commit_field_element(el)
        transcript.commit_bytes(h2_proto.get_final_root())
        for el in h2_proto.get_final_coefficients():
            transcript.commit_field_element(el)

        # 8. challenge indices (src/prover/mod.rs:129-139)
        h1_size = h1_lde.shape[0]
        h2_size = h2_lde.shape[0]
        x_h1 = bytes_to_challenge_index(
            transcript.get_challenge_bytes(), h1_size, self.lde_factor
        )
        x_h2 = bytes_to_challenge_index(
            transcript.get_challenge_bytes(), h2_size, self.lde_factor
        )

        # 9+10. ALL query openings - both FRI chains' coset walks
        # (src/prover/mod.rs:142-143) and the f/g oracle openings
        # (:146-151) - in ONE device gather + ONE transfer
        with timer.stage("queries"):
            h1_plan = NaiveFriIop._query_plan(h1_proto, h1_lde, x_h1)
            h2_plan = NaiveFriIop._query_plan(h2_proto, h2_lde, x_h2)
            chain_data = h1_plan[2] + h2_plan[2]
            idx_arrays = h1_plan[3] + h2_plan[3]
            def _entry(o, vals):
                # dropped oracle (tree_drop_min): the gather program
                # rebuilds the tree from the committed values as temps
                if o.dropped:
                    return (None, None, vals)
                return (o.leaf_hashes, tuple(o.levels), vals)

            chain_data += [
                _entry(o, f_ldes[r]) for r, o in enumerate(f_oracles)
            ] + [_entry(g_oracle, g_lde_vals)]
            idx_arrays += [jnp.asarray([x_h1], jnp.int32)] * len(f_oracles) + [
                jnp.asarray([x_h2], jnp.int32)
            ]
            # At configs[3] scale the ONE-program gather cannot compile:
            # its arguments alone are 10.5 GiB (f/g/h values + FRI
            # intermediates) and one dropped-tree rebuild adds ~5 GiB of
            # temps — 15.81 GiB vs the 15.75 budget (run5h step_3). Per-
            # oracle programs see only their own values; the dispatches
            # pipeline and ONE fetch drains them, so the queries stage
            # still pays a single transfer.
            n1, n2 = len(h1_plan[2]), len(h2_plan[2])
            if h1_size >= _GATHER_SPLIT_MIN:
                # SEQUENTIAL per-oracle gathers, freeing each oracle's
                # committed values the moment its result lands: the
                # pipelined form kept all 10.5 GiB of values resident
                # while the 2^25-leaf rebuild needed ~5 GiB of temps
                # and tipped HBM at runtime (run5h step_5). Every ref
                # holder must drop: the plans' lists, the prototypes'
                # intermediate_values, and the h1/h2 locals.
                h1_plan[2].clear()
                h2_plan[2].clear()
                h1_proto.intermediate_values = [None] * len(
                    h1_proto.intermediate_values
                )
                h2_proto.intermediate_values = [None] * len(
                    h2_proto.intermediate_values
                )
                h1_lde = h2_lde = None
                gathered = []
                for k_entry in range(len(chain_data)):
                    gathered.append(
                        jax.device_get(
                            _gather_chain_queries(
                                [chain_data[k_entry]], [idx_arrays[k_entry]]
                            )[0]
                        )
                    )
                    chain_data[k_entry] = None
            else:
                gathered = jax.device_get(
                    _gather_chain_queries(chain_data, idx_arrays)
                )
            fri_proof_h1 = NaiveFriIop._proof_from_gathered(
                h1_proto, h1_plan[0], h1_plan[1], gathered[:n1], ops
            )
            fri_proof_h2 = NaiveFriIop._proof_from_gathered(
                h2_proto, h2_plan[0], h2_plan[1], gathered[n1 : n1 + n2], ops
            )
            f_queries = []
            for r, (v, sibs) in enumerate(gathered[n1 + n2 : -1]):
                path = [digest_to_bytes(sibs[d, 0]) for d in range(sibs.shape[0])]
                f_queries.append(
                    IopQuery(index=x_h1, value=int(ops.decode(v[0])), path=path)
                )
            gv, gsibs = gathered[-1]
            g_query = IopQuery(
                index=x_h2,
                value=int(ops.decode(gv[0])),
                path=[digest_to_bytes(gsibs[d, 0]) for d in range(gsibs.shape[0])],
            )

        return InstanceProof(
            f_at_z_m=f_at_z_m,
            f_iop_roots=f_iop_roots,
            g_iop_root=g_iop_root,
            f_queries=f_queries,
            g_query=g_query,
            h1_iop_roots=h1_proto.get_roots(),
            h2_iop_roots=h2_proto.get_roots(),
            fri_proof_h1=fri_proof_h1,
            fri_proof_h2=fri_proof_h2,
        )

    def prove_batch(self, witnesses: List[List[List[int]]]) -> List[InstanceProof]:
        """Prove MANY witnesses of this instance at once: every device
        stage runs as ONE vmapped program over the batch axis, so a batch
        of B proofs pays the prover's 5-dispatch floor once instead of B
        times and fills the chip with B-way parallel work — a throughput
        mode the reference's one-proof-per-call API cannot express
        (src/prover/mod.rs:66). Each returned proof is byte-identical to
        prove() of the same witness (tests/test_batch.py).

        FALLBACK BEHAVIOR (deliberate, covered by
        tests/test_batch.py::test_prove_batch_mesh_fallback): when a
        `mesh` was passed to the Prover, when B == 1, or when the
        instance has no constraints or no boundary constraints, the
        batch degrades to sequential `prove()` calls — proofs stay
        byte-identical, only the batching throughput is lost. The
        mesh case is intentional: the vmapped stages and the shard_map
        sharded stages are alternative ways to fill the chip (batch axis
        vs domain axis); composing them (vmap over shard_map) multiplies
        per-device memory by B at configs[3]-scale domains, which is the
        regime meshes exist to avoid. Batch under a mesh therefore means
        "distribute each proof, run proofs sequentially"."""
        if (
            self.mesh is not None
            or len(witnesses) == 1
            or not self.arp.properties.constraints
            or not self.arp.properties.boundary_constraints
        ):
            return [self.prove(w) for w in witnesses]
        ops = self.ops
        field = self.field
        B = len(witnesses)
        transcripts = [Blake2sTranscript(field) for _ in witnesses]
        self.last_transcripts = transcripts
        from .profiling import StageTimer

        timer = StageTimer()
        self.last_timings = timer

        # stage 1, batched
        with timer.stage("batch:witness+f_ldes+f_oracles"):
            w_dev = jnp.stack([self.arp.encode_witness(w) for w in witnesses])
            if self._stage1_batch_fn is None:
                self._stage1_batch_fn = jax.jit(jax.vmap(self._stage1_raw))
                self._stage_g_batch_fn = jax.jit(jax.vmap(self._stage_g_raw))
            _coeffs_b, f_ldes_b, f_trees_b, f_roots_b = self._stage1_batch_fn(w_dev)
            witness_polys_b = _coeffs_b
            f_roots = np.asarray(jax.device_get(f_roots_b))  # (B, R, 8) SYNC
        f_root_bytes = [[digest_to_bytes(r) for r in f_roots[b]] for b in range(B)]
        for b, t in enumerate(transcripts):
            for rb in f_root_bytes[b]:
                t.commit_bytes(rb)

        # G, batched (challenges drawn per proof in reference order)
        with timer.stage("batch:g_composition+g_oracle"):
            g_poly_b = self.ali.calculate_g_batch(transcripts, witness_polys_b)
            g_lde_b, g_tree_b, g_root_b = self._stage_g_batch_fn(g_poly_b)
            g_roots = np.asarray(jax.device_get(g_root_b))  # (B, 8) SYNC
        g_root_bytes = [digest_to_bytes(r) for r in g_roots]
        for b, t in enumerate(transcripts):
            t.commit_bytes(g_root_bytes[b])

        # DEEP, batched
        with timer.stage("batch:deep"):
            h1_b, h2_b, f_at_z_m_b, _g_at_z_b = self.ali.calculate_deep_batch(
                witness_polys_b, f_ldes_b, g_poly_b, g_lde_b, transcripts
            )

        # FRI pair, batched
        from .fri.fri import fri_chain_pair_batch

        with timer.stage("batch:fri_h1+h2"):
            chains, idpos = fri_chain_pair_batch(
                field, h1_b, h2_b, self.lde_factor,
                self.fri_final_degree_plus_one, self._fri_batch_cache,
            )
            (trees1_b, roots1_b, inter1_b, fc1_b), (trees2_b, roots2_b, inter2_b, fc2_b) = chains
            r1, c1, r2, c2 = jax.device_get((roots1_b, fc1_b, roots2_b, fc2_b))  # SYNC

        # per-proof prototypes (root-only trees; queries rebuild them in
        # the batched gather below) + final-root/coeff commits + indices
        protos = []
        for b in range(B):
            t = transcripts[b]
            pair = []
            for roots_np, fc_np, n_rounds, idpo in (
                (np.asarray(r1[b]), np.asarray(c1[b]), len(inter1_b), idpos[0]),
                (np.asarray(r2[b]), np.asarray(c2[b]), len(inter2_b), idpos[1]),
            ):
                proto = NaiveFriIop._assemble_prototype(
                    ops, field, [()] * (n_rounds + 1), roots_np,
                    [None] * n_rounds,  # values live batched; gather is batched
                    fc_np, idpo, self.fri_final_degree_plus_one, self.lde_factor,
                )
                pair.append(proto)
            protos.append(pair)
            for proto in pair:
                t.commit_bytes(proto.get_final_root())
                for el in proto.get_final_coefficients():
                    t.commit_field_element(el)

        h1_size, h2_size = h1_b.shape[1], h2_b.shape[1]
        x_h1 = [
            bytes_to_challenge_index(
                t.get_challenge_bytes(), h1_size, self.lde_factor
            )
            for t in transcripts
        ]
        x_h2 = [
            bytes_to_challenge_index(
                t.get_challenge_bytes(), h2_size, self.lde_factor
            )
            for t in transcripts
        ]

        # ALL query openings for ALL proofs: one vmapped gather program
        with timer.stage("batch:queries"):
            from .domain import (
                coset_for_natural_index_and_size,
                index_and_size_for_next_domain,
            )

            def chain_entries(trees_b, values_b_list):
                return [
                    ((tb[0], tb[1], vb) if len(tb) else (None, None, vb))
                    for tb, vb in zip(trees_b, values_b_list)
                ]

            chain_data = []
            idx_arrays = []
            cosets_h1, cosets_h2 = [], []
            for trees_b, vals_list, x_list, cosets_out in (
                (trees1_b, [h1_b] + list(inter1_b), x_h1, cosets_h1),
                (trees2_b, [h2_b] + list(inter2_b), x_h2, cosets_h2),
            ):
                n_expected = len(vals_list)
                size = vals_list[0].shape[1]
                walks = []
                for x in x_list:
                    idx, sz = x, size
                    walk = []
                    for _ in range(n_expected):
                        walk.append(coset_for_natural_index_and_size(idx, sz))
                        idx, sz = index_and_size_for_next_domain(idx, sz)
                    walks.append(walk)
                cosets_out.extend(walks)
                chain_data += chain_entries(trees_b, vals_list)
                for ri in range(n_expected):
                    idx_arrays.append(
                        jnp.asarray(
                            np.asarray([walks[b][ri] for b in range(B)],
                                       dtype=np.int32)
                        )
                    )
            num_registers = f_ldes_b.shape[1]
            chain_data += chain_entries(
                f_trees_b, [f_ldes_b[:, r] for r in range(num_registers)]
            ) + chain_entries((g_tree_b,), [g_lde_b])
            idx_arrays += [
                jnp.asarray(np.asarray(x_h1, dtype=np.int32)[:, None])
            ] * num_registers + [
                jnp.asarray(np.asarray(x_h2, dtype=np.int32)[:, None])
            ]
            gathered = jax.device_get(
                jax.vmap(_gather_chain_queries)(chain_data, idx_arrays)
            )

        # host assembly per proof
        proofs = []
        n1 = len(inter1_b) + 1
        n2 = len(inter2_b) + 1
        for b in range(B):
            sliced = [(v[b], sibs[b]) for v, sibs in gathered]
            h1_proto, h2_proto = protos[b]
            fri_proof_h1 = NaiveFriIop._proof_from_gathered(
                h1_proto,
                [h1_proto.l0_commitment] + h1_proto.intermediate_commitments,
                cosets_h1[b], sliced[:n1], ops,
            )
            fri_proof_h2 = NaiveFriIop._proof_from_gathered(
                h2_proto,
                [h2_proto.l0_commitment] + h2_proto.intermediate_commitments,
                cosets_h2[b], sliced[n1 : n1 + n2], ops,
            )
            f_queries = []
            for r, (v, sibs) in enumerate(sliced[n1 + n2 : -1]):
                path = [digest_to_bytes(sibs[d, 0]) for d in range(sibs.shape[0])]
                f_queries.append(
                    IopQuery(index=x_h1[b], value=int(ops.decode(v[0])), path=path)
                )
            gv, gsibs = sliced[-1]
            g_query = IopQuery(
                index=x_h2[b],
                value=int(ops.decode(gv[0])),
                path=[digest_to_bytes(gsibs[d, 0]) for d in range(gsibs.shape[0])],
            )
            proofs.append(
                InstanceProof(
                    f_at_z_m=f_at_z_m_b[b],
                    f_iop_roots=f_root_bytes[b],
                    g_iop_root=g_root_bytes[b],
                    f_queries=f_queries,
                    g_query=g_query,
                    h1_iop_roots=h1_proto.get_roots(),
                    h2_iop_roots=h2_proto.get_roots(),
                    fri_proof_h1=fri_proof_h1,
                    fri_proof_h2=fri_proof_h2,
                )
            )
        return proofs
