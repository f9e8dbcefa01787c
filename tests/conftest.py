"""Test harness: force the JAX CPU backend with 8 virtual devices.

The real chip is reached through a high-latency tunnel (each eager
dispatch costs ~30ms), so unit tests run on the CPU backend; multi-device
sharding tests use 8 virtual CPU devices. The driver separately validates
the real-TPU path via bench.py and __graft_entry__.py.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# HODOR_TEST_CACHE overrides so concurrent suites never share a cache
# dir (shared dirs have produced segfaulting torn reads - CLAUDE.md).
# Under pytest-xdist each worker gets its OWN subdirectory for the same
# reason; `pytest -n 4` cuts the cold-suite wall ~3x on a 4-core host
# (compile time dominates it).
_cache = os.environ.get("HODOR_TEST_CACHE", "/root/.cache/jax_hodor")
_worker = os.environ.get("PYTEST_XDIST_WORKER")
if _worker:
    _cache = os.path.join(_cache + "_xdist", _worker)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
