"""Structured per-stage timing + jax.profiler trace capture.

The reference's only observability is println! stage banners in the
prover (src/prover/mod.rs:97,110) and std::time::Instant prints in the
benchmark tests (src/experiments/vdf.rs:153-219). Here timing is a
first-class facility (SURVEY §5): `StageTimer` collects named stage
wall-times into a structured record any driver can serialize, and
`device_trace` wraps a block in a jax.profiler trace whose per-op
durations can be aggregated with `summarize_trace`.

Stage boundaries in the prover sit at Fiat-Shamir commits, but several
stages deliberately do NOT synchronize (the warm prove makes exactly
five device->host transfers), so a stage's wall time can absorb the
ASYNC device work of earlier stages — round 4 measured "FRI pair 74%
of the prove" this way when the isolated pair ladder is 158 ms.
Set HODOR_SYNC_STAGES=1 to block on all live device arrays at each
stage exit: per-stage walls become truthful at the cost of stalling the
dispatch pipeline (debug/profiling only — do not benchmark totals with
it on).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, List, Optional


def _sync_stages() -> bool:
    import os

    return os.environ.get("HODOR_SYNC_STAGES") == "1"


@dataclasses.dataclass
class StageRecord:
    name: str
    seconds: float


class StageTimer:
    """Collects (stage, seconds) pairs; nestable via `stage()`."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.records: List[StageRecord] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if _sync_stages():
                # ONE device barrier, not per-array blocks: TPU executes
                # enqueued programs in order, so blocking on a trivial op
                # submitted now implies everything before it finished.
                # The previous per-live-array loop paid one ~30 ms tunnel
                # RTT per array — the FRI stage leaves O(hundreds) live
                # (trees x levels), which fabricated "FRI = 13.5 s of the
                # 2^18 prove" while the isolated pair ladder is 455 ms
                # (run5e step_3). Measured-stall artifact, not work.
                import jax
                import jax.numpy as jnp

                jax.jit(lambda: jnp.zeros((), jnp.uint32))().block_until_ready()
            self.records.append(StageRecord(name, time.perf_counter() - t0))

    def total(self) -> float:
        return sum(r.seconds for r in self.records)

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r.name] = out.get(r.name, 0.0) + r.seconds
        return out

    def to_json(self) -> str:
        return json.dumps(
            {"stages": [[r.name, r.seconds] for r in self.records], "total_s": self.total()}
        )

    def report(self) -> str:
        lines = [f"  {r.seconds*1e3:10.1f} ms  {r.name}" for r in self.records]
        lines.append(f"  {self.total()*1e3:10.1f} ms  TOTAL")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block (works on the axon TPU backend;
    inspect with summarize_trace)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 30) -> List[tuple]:
    """Aggregate (op name -> total device microseconds) from the newest
    .trace.json.gz under log_dir; returns the top-N (name, total_us)."""
    import glob
    import gzip

    traces = sorted(glob.glob(log_dir + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        return []
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    durs: Dict[str, float] = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] = durs.get(name, 0.0) + ev["dur"]
    return sorted(durs.items(), key=lambda kv: -kv[1])[:top]
