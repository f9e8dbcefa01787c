"""Minimal axon TPU probe: succeeds (exit 0) iff the pool grants a chip
and a trivial jitted op runs on it.

Kept in the repo (not /tmp) so it survives machine resets between
sessions; scripts/tpu_watchdog.sh retries it until the grant lands.
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_hodor_probe")

try:
    devs = jax.devices()
except Exception as e:  # noqa: BLE001 - any init failure means "not yet"
    print(f"probe: init failed: {e}", flush=True)
    sys.exit(1)

if not devs or devs[0].platform == "cpu":
    print(f"probe: no accelerator ({devs})", flush=True)
    sys.exit(1)

import jax.numpy as jnp

x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(8, dtype=jnp.uint32))
print(f"probe: ok on {devs[0]} -> {x.tolist()}", flush=True)
sys.exit(0)
