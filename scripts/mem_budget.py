"""HBM budget at reference-benchmark scale (VERDICT round-2 item 6).

Compile-only (never executes): lowers the prover's big device programs
at configs[3] scale (2^20-row quadratic VDF -> h1 = 2^24, h2 = 2^25) and
prints XLA's memory_analysis per program, with tree-dropping off vs on
(HODOR_TREE_DROP_MIN; see hodor_tpu/merkle/tree.py:tree_drop_min).
Results are recorded in BASELINE.md §"Memory budget".

Usage:
    python scripts/mem_budget.py [max_log_n]   # default 24

Each (program, size, mode) is compiled in-process; CPU backend. The
numbers are XLA's buffer-assignment peaks for the CPU target; TPU
assignments differ in padding but the tree/values ratios carry over.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("HODOR_BENCH_CACHE", "/root/.cache/jax_hodor_membudget"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GIB = float(1 << 30)


def fmt(b):
    return f"{b / GIB:.2f}"


def analyze(compiled):
    m = compiled.memory_analysis()
    return {
        "temp_GiB": round(m.temp_size_in_bytes / GIB, 3),
        "output_GiB": round(m.output_size_in_bytes / GIB, 3),
        "arg_GiB": round(m.argument_size_in_bytes / GIB, 3),
        "peakish_GiB": round(
            (m.temp_size_in_bytes + m.output_size_in_bytes + m.argument_size_in_bytes)
            / GIB,
            3,
        ),
    }


def fri_chain_analysis(log_n, drop_min):
    import jax.numpy as jnp

    from hodor_tpu.domain import log2_floor
    from hodor_tpu.field import F_STARK
    from hodor_tpu.field.limbs import ops_for
    from hodor_tpu.fri.fri import _fri_chain
    from hodor_tpu.ntt import _omega_table

    ops = ops_for(F_STARK)
    n = 1 << log_n
    lde_factor = 16
    num_steps = log2_floor(n // lde_factor)  # fold to degree 1
    om = jax.ShapeDtypeStruct(((n // 2), ops.n16), jnp.uint32)
    vals = jax.ShapeDtypeStruct((n, ops.n16), jnp.uint32)
    lowered = _fri_chain.lower(ops, vals, num_steps, om, drop_min)
    return analyze(lowered.compile())


def stage1_analysis(log_t, drop_min, seq_min=None):
    os.environ["HODOR_TREE_DROP_MIN"] = str(drop_min)
    import hodor_tpu.ntt as nttmod
    from hodor_tpu.field import F_STARK
    from hodor_tpu.models import VDF
    from hodor_tpu.prover import Prover

    # shape-only witness: Prover compiles from encode shapes; build tiny
    # witness rows then re-lower at the big T via ShapeDtypeStruct
    import jax.numpy as jnp

    old_seq = nttmod._LDE_SEQUENTIAL_MIN
    if seq_min is not None:
        # the in-process analog of HODOR_LDE_SEQ_MIN (read at import)
        nttmod._LDE_SEQUENTIAL_MIN = seq_min
    try:
        t = 1 << log_t
        witness, props = VDF(F_STARK, 1, 2, 3).into_arp()
        props.num_rows = t
        p = Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)
        wd = jax.ShapeDtypeStruct((2, t, p.ops.n16), jnp.uint32)
        return analyze(p._stage1_fn.lower(wd).compile())
    finally:
        nttmod._LDE_SEQUENTIAL_MIN = old_seq


def main():
    max_log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    out = {}
    for log_n in (20, 22, max_log_n):
        for mode, drop in (("full", 1 << 62), ("drop", 1 << 22)):
            key = f"fri_chain_2^{log_n}_{mode}"
            print(f"compiling {key} ...", flush=True)
            try:
                out[key] = fri_chain_analysis(log_n, drop)
            except Exception as e:  # record, keep going
                out[key] = {"error": repr(e)[:200]}
            print(json.dumps({key: out[key]}), flush=True)
    for log_t in (16, 18, 20):
        if log_t + 4 > max_log_n:
            continue
        for mode, drop in (("full", 0), ("drop", 1 << 22)):
            key = f"stage1_T2^{log_t}_{mode}"
            print(f"compiling {key} ...", flush=True)
            try:
                out[key] = stage1_analysis(log_t, drop)
            except Exception as e:
                out[key] = {"error": repr(e)[:200]}
            print(json.dumps({key: out[key]}), flush=True)
    # stage1 with the coset NTTs serialized (the HODOR_LDE_SEQ_MIN=27
    # campaign fallback): the batched form at T=2^18 is the biggest temp
    # consumer of the whole prove
    for log_t in (18,):
        if log_t + 4 > max_log_n:
            continue
        key = f"stage1_T2^{log_t}_seq"
        print(f"compiling {key} ...", flush=True)
        try:
            out[key] = stage1_analysis(log_t, 1 << 22, seq_min=1 << 27)
        except Exception as e:
            out[key] = {"error": repr(e)[:200]}
        print(json.dumps({key: out[key]}), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "mem_budget.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
