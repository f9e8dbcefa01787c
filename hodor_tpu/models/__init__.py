"""Workload "models": the AIR instances the reference ships.

- Fibonacci gadget: hodor_tpu.air.Fibonacci
  (src/air/test_trace_system.rs:158-246)
- VDF (quadratic Fp2 squaring chain): src/experiments/vdf.rs
- CubicVDF (cubing chain, 4 registers): src/experiments/cubic_vdf.rs
"""

from .vdf import VDF
from .cubic_vdf import CubicVDF

__all__ = ["VDF", "CubicVDF"]
