"""Prover orchestration (reference: src/prover/mod.rs).

Precomputes ARP + ALI at construction (amortized across proofs, like
Prover::new, src/prover/mod.rs:46-64); `prove` runs the full pipeline
(witness iNTT -> f LDEs -> f oracles -> G -> G LDE/oracle -> DEEP ->
FRI(h1), FRI(h2) -> queries) with device compute between the host-side
Fiat-Shamir transcript points.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List

import jax
import jax.numpy as jnp

from .ali import ALIInstance
from .arp import ARPInstance, InstanceProperties
from .errors import SynthesisError
from .field.limbs import ops_for
from .fri import FRIProof, NaiveFriIop
from .merkle.tree import IopQuery, MerkleTree
from .ntt import lde
from .transcript import Blake2sTranscript, bytes_to_challenge_index


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


def _query_device(tree: MerkleTree, values_dev, natural_index: int, ops) -> IopQuery:
    """Build an IopQuery by decoding a single committed value from device."""
    value = int(ops.decode(values_dev[natural_index]))
    return IopQuery(index=natural_index, value=value, path=tree.get_path(natural_index))


class Prover:
    def __init__(self, properties: InstanceProperties, lde_factor: int,
                 fri_final_degree_plus_one: int):
        self.field = properties.field
        self.ops = ops_for(self.field)
        self.arp = ARPInstance.from_instance(properties)
        self.ali = ALIInstance(self.arp)
        self.lde_factor = lde_factor
        self.fri_final_degree_plus_one = fri_final_degree_plus_one
        self._lde_fn = jax.jit(
            lambda coeffs: lde(self.ops, coeffs, self.lde_factor)
        )

    def prove(self, witness: List[List[int]]) -> InstanceProof:
        ops = self.ops
        field = self.field
        transcript = Blake2sTranscript(field)

        # 1. witness -> polynomials (src/prover/mod.rs:69)
        w_dev = self.arp.encode_witness(witness)
        witness_polys = self.arp.calculate_witness_polys(w_dev)  # (R, T, L)

        # 2. f LDEs + oracles (src/prover/mod.rs:71-87)
        f_ldes = self._lde_fn(witness_polys)  # (R, N_f, L)
        num_registers = f_ldes.shape[0]
        f_oracles = [MerkleTree.create(f_ldes[r], field) for r in range(num_registers)]
        f_iop_roots = []
        for o in f_oracles:
            root = o.get_root()
            transcript.commit_bytes(root)
            f_iop_roots.append(root)

        # 3. G composition (src/prover/mod.rs:89)
        g_poly = self.ali.calculate_g(transcript, witness_polys)  # (D, L)

        # 4. G LDE + oracle (src/prover/mod.rs:91-95)
        g_lde_vals = self._lde_fn(g_poly)  # (N_g, L)
        g_oracle = MerkleTree.create(g_lde_vals, field)
        g_iop_root = g_oracle.get_root()
        transcript.commit_bytes(g_iop_root)

        # 5. DEEP (src/prover/mod.rs:99-106)
        h1_lde, h2_lde, f_at_z_m, _g_at_z = self.ali.calculate_deep(
            witness_polys, f_ldes, g_poly, g_lde_vals, transcript
        )

        # 6. FRI for h1 and h2 (src/prover/mod.rs:112-113)
        h1_proto = NaiveFriIop.proof_from_lde(
            h1_lde, self.lde_factor, self.fri_final_degree_plus_one, field
        )
        h2_proto = NaiveFriIop.proof_from_lde(
            h2_lde, self.lde_factor, self.fri_final_degree_plus_one, field
        )

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

        # 9. FRI query paths (src/prover/mod.rs:142-143)
        fri_proof_h1 = NaiveFriIop.prototype_into_proof(h1_proto, h1_lde, x_h1, field)
        fri_proof_h2 = NaiveFriIop.prototype_into_proof(h2_proto, h2_lde, x_h2, field)

        # 10. f / g oracle queries (src/prover/mod.rs:146-151)
        f_queries = [
            _query_device(f_oracles[r], f_ldes[r], x_h1, ops)
            for r in range(num_registers)
        ]
        g_query = _query_device(g_oracle, g_lde_vals, x_h2, ops)

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
