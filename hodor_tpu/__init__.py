"""hodor_tpu: a TPU-native zkSTARK proving framework.

Re-implements the full capability surface of matter-labs/hodor (a Rust
zkSTARK prover/verifier: AIR -> ARP -> ALI/DEEP -> FRI -> IOP pipeline,
see /root/reference) as an idiomatic JAX/XLA/Pallas framework:

- prime-field arithmetic as vectorized u16-limb Montgomery kernels
  (reference: the external `ff_ce` crate used at src/lib.rs:35-38),
- NTT/LDE as batched device kernels with a four-step sharded variant for
  multi-chip meshes (reference: src/fft/*),
- Blake2s Merkle commitments hashed on device (reference: src/iop/*),
- a byte-exact Blake2s Fiat-Shamir transcript (reference: src/transcript),
- the ARP/ALI/DEEP/FRI protocol layers and Prover/Verifier orchestration
  (reference: src/arp, src/ali, src/fri, src/prover, src/verifier).
"""

from .errors import SynthesisError, TracingError

__version__ = "0.1.0"
