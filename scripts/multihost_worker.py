"""Per-process worker for the multi-host test harness.

Each process models one HOST of a multi-host deployment (SURVEY §2
"Distributed communication backend"): it joins a jax.distributed job,
contributes `--local-devices` virtual CPU devices to the global mesh,
and runs the cross-host pieces of the prove pipeline in SPMD-controller
style (every process executes the same program; all host-visible
results are fully replicated). Checks, each against the single-process
path computed locally from the shared seed:

  1. four_step_ntt over the GLOBAL mesh (the transpose between the two
     NTT stages is a cross-process all-to-all — the generalization of
     parallel_fft's gather/scatter, /root/reference/src/fft/fft.rs:80-124)
  2. sharded_lde (coset-sharded multi-coset LDE,
     src/polynomials/mod.rs:418-482 distributed over hosts)
  3. sharded_merkle_root (shard-local subtrees + one all_gather of
     subtree roots + replicated top levels; must be bit-identical to
     MerkleTree.create)
  4. process 0 audits the compiled HLO of (1): the cross-shard transpose
     must be a collective-permute/all-to-all, NOT a full-array
     all-gather.

Prints WORKER_OK <pid> on success; any mismatch asserts.

Usage: python scripts/multihost_worker.py --coordinator 127.0.0.1:PORT
         --num-processes 2 --process-id K --local-devices 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--log-n", type=int, default=11)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # the axon plugin must not init
    # NOTE: no shared compilation cache — two processes racing one cache
    # dir can segfault on concurrent reads (observed round 2); the F_P63
    # graphs here compile in seconds anyway.

    # jax.distributed.initialize must run BEFORE anything that can
    # initialize the XLA backend — importing hodor_tpu modules touches
    # jax (device-constant construction), so the init comes first
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from hodor_tpu.parallel.multihost import (
        global_mesh,
        host_value,
        replicated,
        row_sharded,
        root_digest_bytes,
        sharded_merkle_root,
    )

    import numpy as np

    from hodor_tpu.field import F_P63, ops_for
    from hodor_tpu.merkle.tree import MerkleTree
    from hodor_tpu.ntt import lde as local_lde, ntt as local_ntt
    from hodor_tpu.parallel import four_step_ntt, sharded_lde

    ops = ops_for(F_P63)
    mesh = global_mesh()
    n_dev = mesh.devices.size
    assert n_dev == args.num_processes * args.local_devices, (
        f"global mesh has {n_dev} devices, expected "
        f"{args.num_processes}x{args.local_devices}"
    )

    n = 1 << args.log_n
    rng = np.random.default_rng(7)  # same seed on every process
    vals = [int(v) for v in rng.integers(0, F_P63.p, size=n, dtype=np.uint64)]
    limbs_host = np.asarray(jax.device_get(ops.encode(vals)))  # local encode

    from jax.experimental import multihost_utils

    # ---- 1. cross-host four-step NTT --------------------------------
    a_global = row_sharded(mesh, limbs_host)
    out_global = jax.jit(
        lambda x: four_step_ntt(ops, x, mesh)
    )(a_global)
    got_ntt = multihost_utils.process_allgather(out_global, tiled=True)
    want_ntt = np.asarray(jax.device_get(local_ntt(ops, jax.device_put(limbs_host))))
    assert (got_ntt == want_ntt).all(), "cross-host four_step_ntt mismatch"

    # ---- 2. cross-host multi-coset LDE ------------------------------
    factor = 16
    coeffs_global = replicated(mesh, limbs_host)
    lde_global = jax.jit(
        lambda x: sharded_lde(ops, x, factor, mesh)
    )(coeffs_global)
    got_lde = multihost_utils.process_allgather(lde_global, tiled=True)
    want_lde = np.asarray(
        jax.device_get(local_lde(ops, jax.device_put(limbs_host), factor))
    )
    assert (got_lde == want_lde).all(), "cross-host sharded_lde mismatch"

    # ---- 3. cross-host Merkle root ----------------------------------
    leaves_global = row_sharded(mesh, limbs_host)
    digest = jax.jit(
        lambda x: sharded_merkle_root(ops, x, mesh)
    )(leaves_global)
    got_root = root_digest_bytes(host_value(digest))
    want_root = MerkleTree.create(jax.device_put(limbs_host), F_P63).get_root()
    assert got_root == want_root, (
        f"cross-host merkle root mismatch: {got_root.hex()} != {want_root.hex()}"
    )

    # ---- 4. collective audit (process 0) ----------------------------
    if args.process_id == 0:
        txt = (
            jax.jit(lambda x: four_step_ntt(ops, x, mesh))
            .lower(a_global)
            .compile()
            .as_text()
        )
        has_transpose_collective = ("all-to-all" in txt) or (
            "collective-permute" in txt
        )
        assert has_transpose_collective, (
            "four_step_ntt compiled without a cross-shard transpose collective"
        )
        # the input is already sharded and stays sharded: a full-array
        # all-gather would mean the work replicated instead of distributed
        assert "all-gather" not in txt, (
            "four_step_ntt compiled to a full-array all-gather"
        )
        print("HLO_AUDIT_OK all-to-all/collective-permute present, no all-gather")

    multihost_utils.sync_global_devices("done")
    print(f"WORKER_OK {args.process_id}", flush=True)


if __name__ == "__main__":
    main()
