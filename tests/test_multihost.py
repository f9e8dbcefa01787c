"""Multi-host (multi-PROCESS) distribution tests.

SURVEY §2 specifies the distributed backend as "jax.distributed ...
all_to_all/psum/all_gather over ICI within a slice and DCN across
slices"; the reference has no distributed facility at all (its
parallel_fft two-stage split, /root/reference/src/fft/fft.rs:68-125, is
the single-machine template these paths generalize). No multi-host
hardware exists in this container, so the evidence standard is the same
as round 3's single-host distribution work: genuine multi-process
execution on the CPU backend (2 processes x 4 virtual devices = 2
simulated hosts over a gRPC coordinator), bit-equality against the
single-process path, and an HLO collective audit.

The actual checks live in scripts/multihost_worker.py (each process
must run the same SPMD program, so they cannot live in this pytest
process); this test spawns the job and asserts every worker passed.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("num_processes,local_devices", [(2, 4)])
def test_multihost_ntt_lde_merkle(num_processes, local_devices):
    """2-process x 4-device job: cross-host four-step NTT, coset-sharded
    LDE, and Merkle root reduction all bit-match the single-process
    path; process 0's HLO audit confirms the NTT transpose lowers to a
    cross-shard collective and not a full-array all-gather."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    # no shared compile cache: concurrent processes racing one cache dir
    # can segfault (CLAUDE.md round-2 hazard)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                WORKER,
                "--coordinator",
                f"127.0.0.1:{port}",
                "--num-processes",
                str(num_processes),
                "--process-id",
                str(i),
                "--local-devices",
                str(local_devices),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {i}" in out, f"worker {i} missing OK marker:\n{out[-4000:]}"
    assert "HLO_AUDIT_OK" in outs[0], outs[0][-4000:]
