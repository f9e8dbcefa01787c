"""Prime-field arithmetic layer.

The reference delegates all field arithmetic to the external `ff_ce`
crate (Montgomery-form 4x u64 limbs, derive-generated; instantiated at
src/lib.rs:35-38, src/experiments/mod.rs:18-21, src/bn256.rs:4-7).
Here the same capability is split into:

- `Field`: per-modulus parameters matching ff_ce derive semantics
  (NUM_BITS, CAPACITY, S / 2-adicity, root_of_unity, Montgomery R) plus
  exact host scalar ops on Python ints;
- `limbs` / `LimbOps`: the device implementation - u16-limb Montgomery
  arithmetic vectorized over jnp uint32 arrays, TPU-friendly (no u64).
"""

from .field import Field, F257, F_STARK, F_BLS, F_P63
from .limbs import LimbOps, ops_for

__all__ = ["Field", "F257", "F_STARK", "F_BLS", "F_P63", "LimbOps", "ops_for"]
