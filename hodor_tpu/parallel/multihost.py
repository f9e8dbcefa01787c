"""Multi-host (multi-process) distribution: the jax.distributed runtime
plus the cross-host pieces of the prove pipeline.

The reference is a single-process shared-memory program (SURVEY §2:
"Distributed communication backend: none — no MPI/NCCL/Gloo"); its
`parallel_fft` two-stage split (/root/reference/src/fft/fft.rs:68-125)
is the algorithmic template that `parallel.four_step_ntt` generalizes.
This module supplies what a MULTI-PROCESS deployment (one process per
host, devices joined into one global mesh over ICI within a slice and
DCN across slices) additionally needs:

- `init_multihost`: jax.distributed.initialize wrapper (coordinator,
  process count, process id) usable both on real pods and in the CPU
  simulation harness (tests/test_multihost.py spawns 2 processes x 4
  virtual CPU devices to model 2 hosts);
- `global_mesh` / `replicated` / `host_value`: global-mesh construction
  and host<->global-array plumbing in the SPMD-controller style (every
  process runs the same program; host-visible results must be fully
  replicated so each process derives identical Fiat-Shamir transcripts);
- `sharded_merkle_root`: Merkle commitment with the leaf axis sharded
  across hosts — shard-local subtree hashing (zero communication), ONE
  all_gather of the per-shard subtree roots, and a replicated top-levels
  finish. Bit-identical to MerkleTree.create's root because a shard's
  contiguous 2^k leaves form a complete subtree of the reference heap
  layout (src/iop/blake2s_trivial_iop.rs:131-219).

The sharded NTT/LDE/iNTT themselves need nothing new: `four_step_ntt`,
`sharded_lde` and `sharded_icoset_ntt` are mesh-shape-agnostic — over a
multi-process mesh XLA lowers their transposes to cross-host
all-to-alls. tests/test_multihost.py runs them over a genuine
2-process mesh and checks bit-equality against the single-process path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.field import Field
from ..field.limbs import LimbOps


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
) -> None:
    """Join this process to a jax.distributed job. On real multi-host
    slices the three arguments come from the cluster scheduler; the CPU
    test harness passes 127.0.0.1:<port> and sets
    xla_force_host_platform_device_count before calling."""
    if local_device_count is not None:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        want = f"--xla_force_host_platform_device_count={local_device_count}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = f"{flags} {want}".strip()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "shards") -> Mesh:
    """1-D mesh over ALL devices of the distributed job (every process
    sees the global device list after jax.distributed.initialize)."""
    return Mesh(np.array(jax.devices()), (axis,))


def replicated(mesh: Mesh, host_array) -> jax.Array:
    """Host numpy array (identical on every process, e.g. derived from a
    shared seed or the replayed transcript) -> fully-replicated global
    jax.Array on the mesh."""
    arr = np.asarray(host_array)
    sharding = NamedSharding(mesh, P(*([None] * arr.ndim)))
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def row_sharded(mesh: Mesh, host_array, axis: str = "shards") -> jax.Array:
    """Host numpy array (identical on every process) -> global array
    sharded on axis 0. Each process materializes only its own rows."""
    arr = np.asarray(host_array)
    spec = P(axis, *([None] * (arr.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def host_value(global_array) -> np.ndarray:
    """Fetch a fully-replicated global array to host. Every process gets
    the same value (this is the only legal device->host fetch in the
    SPMD-controller style: non-replicated arrays are not fully
    addressable from one process)."""
    shards = global_array.addressable_shards
    return np.asarray(shards[0].data)


def sharded_merkle_root(
    ops: LimbOps, leaf_limbs, mesh: Mesh, axis: str = "shards"
):
    """Merkle root of (N, n16) Montgomery leaf values with the leaf axis
    sharded over the mesh (across hosts in a multi-process job).

    Levels up to log2(N / n_shards) are shard-local (a contiguous leaf
    block of power-of-two size is a complete subtree of the heap
    layout); the per-shard subtree roots are exchanged with ONE
    all_gather (8 u32 words per shard — the only cross-host traffic),
    and the remaining log2(n_shards) levels hash replicated. The root is
    bit-identical to MerkleTree.create(leaf_limbs).get_root()'s digest
    (tests/test_multihost.py, tests/test_parallel.py).

    Returns a replicated (8,) uint32 digest array.
    """
    from ..merkle.blake2s import hash_leaves, hash_nodes, limbs_to_leaf_words

    n = leaf_limbs.shape[0]
    n_shards = mesh.devices.size
    assert n % n_shards == 0 and (n // n_shards) & (n // n_shards - 1) == 0, (
        "leaves per shard must be a power of two"
    )

    def _local(leaves_local):
        words = limbs_to_leaf_words(leaves_local)
        cur = hash_leaves(words)
        while cur.shape[0] > 1:
            cur = hash_nodes(cur[0::2], cur[1::2])
        # (1, 8): this shard's subtree root. One all_gather -> top levels.
        roots = jax.lax.all_gather(cur[0], axis)  # (n_shards, 8)
        while roots.shape[0] > 1:
            roots = hash_nodes(roots[0::2], roots[1::2])
        return roots[0]  # (8,) replicated across shards

    # check_vma=False: the blake2s fori_loop carries start from constant
    # IV words (unvarying) and immediately absorb shard-varying leaf
    # data; shard_map's strict varying-axes typing rejects that mix even
    # though the computation is shard-local by construction.
    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(),
        check_vma=False,
    )(leaf_limbs)


def root_digest_bytes(digest_words) -> bytes:
    """(8,) uint32 digest -> the 32-byte root (LE words, matching
    merkle.blake2s.digest_to_bytes / the reference's Blake2s output)."""
    from ..merkle.blake2s import digest_to_bytes

    return digest_to_bytes(np.asarray(digest_words))
