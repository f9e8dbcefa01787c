"""Prove checkpoint/resume (hodor_tpu/checkpoint.py): an interrupted
prove resumed from ANY completed stage boundary yields byte-identical
proof output (the aux subsystem SURVEY §5 lists as absent in the
reference; stage boundaries per src/prover/mod.rs:82-127)."""

import os

import pytest

from hodor_tpu.checkpoint import STAGES, ProveCheckpoint
from hodor_tpu.field import F_STARK
from hodor_tpu.models import VDF
from hodor_tpu.proof_io import serialize_proof
from hodor_tpu.prover import Prover
from hodor_tpu.verifier import Verifier


@pytest.fixture(scope="module")
def instance():
    witness, props = VDF(F_STARK, 1, 2, 7).into_arp()  # T = 8 rows
    prover = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
    baseline = serialize_proof(prover.prove(witness), F_STARK)
    return witness, props, prover, baseline


def _drop_after(ckdir, keep: int):
    """Delete every stage past the first `keep` (simulates a prove that
    died mid-stage keep+1)."""
    ck = ProveCheckpoint(ckdir)
    for s in STAGES[keep:]:
        for p in ck._paths(s):
            if os.path.exists(p):
                os.remove(p)


def test_checkpointed_prove_matches_plain(tmp_path, instance):
    witness, props, prover, baseline = instance
    blob = serialize_proof(
        prover.prove(witness, checkpoint_dir=str(tmp_path)), F_STARK
    )
    assert blob == baseline
    ck = ProveCheckpoint(str(tmp_path))
    assert ck.completed_prefix() == list(STAGES)


@pytest.mark.slow
@pytest.mark.parametrize("keep", [1, 2, 3, 4])
def test_resume_from_each_stage_boundary(tmp_path, instance, keep):
    witness, props, prover, baseline = instance
    ckdir = str(tmp_path / f"ck{keep}")
    # full checkpointed prove, then truncate to the first `keep` stages
    prover.prove(witness, checkpoint_dir=ckdir)
    _drop_after(ckdir, keep)
    assert ProveCheckpoint(ckdir).completed_prefix() == list(STAGES[:keep])
    resumed = prover.prove(witness, checkpoint_dir=ckdir)
    assert serialize_proof(resumed, F_STARK) == baseline
    assert Verifier(props, lde_factor=16).verify(resumed)
    # the resumed run re-saves the stages it recomputed
    assert ProveCheckpoint(ckdir).completed_prefix() == list(STAGES)


def test_orphan_late_stage_is_ignored(tmp_path, instance):
    """A later stage without its predecessors must not resume (the
    prefix rule in ProveCheckpoint.completed_prefix)."""
    witness, props, prover, baseline = instance
    ckdir = str(tmp_path / "orphan")
    prover.prove(witness, checkpoint_dir=ckdir)
    ck = ProveCheckpoint(ckdir)
    for p in ck._paths("stage1"):
        os.remove(p)
    assert ck.completed_prefix() == []
    blob = serialize_proof(prover.prove(witness, checkpoint_dir=ckdir), F_STARK)
    assert blob == baseline
