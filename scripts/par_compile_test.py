"""Compile-time reducer experiment (VERDICT r04 item 8): can remote
AOT compiles overlap across Python threads?

The axon compile helper is an HTTP service and XLA's compile path
releases the GIL, so N threads issuing .lower().compile() for N
DIFFERENT programs may overlap their remote round trips. If the
measured 2-thread wall is close to max(individual walls) instead of
their sum, Prover init can pre-compile its stage programs in a thread
pool and cut the 300-1600 s cold-prove compile walls ~Nx.

Run INSIDE a campaign step (one tunnel owner at a time).
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_hodor_tpu")
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hodor_tpu.field import F_STARK, ops_for
from hodor_tpu.ntt import ntt


def main():
    ops = ops_for(F_STARK)
    print(f"backend: {jax.devices()[0]}", flush=True)

    # two distinct slow-to-compile programs (different shapes -> no
    # cache sharing; +iota seasoning so a warm persistent cache from a
    # prior run can be dodged by bumping SEED)
    seed = int(os.environ.get("SEED", "0"))

    def make(log_n, salt):
        def f(a):
            b = ops.mul(a, a)
            b = ops.add(b, jnp.uint32(salt) * jnp.ones_like(b))
            return ntt(ops, ops.mul(b, a))

        x = jax.ShapeDtypeStruct((1 << log_n, ops.n16), jnp.uint32)
        return jax.jit(f).lower(x)

    lowered = [make(15, seed), make(17, seed + 1)]

    t0 = time.time()
    c0 = lowered[0].compile()
    t1 = time.time()
    c1 = lowered[1].compile()
    t2 = time.time()
    seq_walls = (t1 - t0, t2 - t1)
    print(f"sequential: {seq_walls[0]:.1f}s + {seq_walls[1]:.1f}s "
          f"= {t2 - t0:.1f}s", flush=True)

    # fresh shapes for the threaded pass (avoid the in-process cache)
    lowered2 = [make(16, seed + 2), make(18, seed + 3)]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(lambda lw: lw.compile(), lowered2))
    par_wall = time.time() - t0
    print(f"2-thread: {par_wall:.1f}s", flush=True)
    print(
        f"VERDICT: {'OVERLAPS' if par_wall < 0.75 * (t2 - t0) else 'SERIALIZES'}"
        f" (2-thread {par_wall:.1f}s vs sequential {t2 - t0:.1f}s; shapes differ"
        " so compare the ratio, not absolutes)",
        flush=True,
    )


if __name__ == "__main__":
    main()
