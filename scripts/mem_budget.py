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
    vals = jax.ShapeDtypeStruct((n, ops.n16), jnp.uint32)
    lowered = _fri_chain.lower(ops, vals, num_steps, log_n, drop_min)
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


from functools import lru_cache


@lru_cache(maxsize=2)
def _big_prover(log_t):
    from hodor_tpu.field import F_STARK
    from hodor_tpu.models import VDF
    from hodor_tpu.prover import Prover

    t = 1 << log_t
    witness, props = VDF(F_STARK, 1, 2, 3).into_arp()
    props.num_rows = t
    return Prover(props.clone(), lde_factor=16, fri_final_degree_plus_one=1)


def stage_g_analysis(log_t, drop_min):
    """G LDE + oracle program at D = 2*T (quadratic VDF max power 2)."""
    import jax.numpy as jnp

    os.environ["HODOR_TREE_DROP_MIN"] = str(drop_min)
    p = _big_prover(log_t)
    d = (1 << log_t) * p.ali.max_constraint_power
    gp = jax.ShapeDtypeStruct((d, p.ops.n16), jnp.uint32)
    return analyze(p._stage_g_fn.lower(gp).compile())


def calc_g_analysis(log_t):
    """ALI G composition program (calculate_g's jitted core)."""
    import jax.numpy as jnp

    from hodor_tpu.transcript import Blake2sTranscript

    p = _big_prover(log_t)
    ali = p.ali
    ops = p.ops
    t = 1 << log_t
    wc = jax.ShapeDtypeStruct((2, t, ops.n16), jnp.uint32)
    cch, bch = ali.draw_g_challenges(Blake2sTranscript(p.field))
    c_alphas = ops.encode([a for a, _ in cch]) if cch else None
    c_betas = ops.encode([b for _, b in cch]) if cch else None
    b_alphas = ops.encode([a for a, _ in bch]) if bch else None
    b_betas = ops.encode([b for _, b in bch]) if bch else None
    fn = jax.jit(ali._calculate_g_traced)
    lowered = fn.lower(
        wc, c_alphas, c_betas, b_alphas, b_betas,
        dict(ali.constraint_divisors), dict(ali.boundary_divisors),
        ali.coset_values,
    )
    return analyze(lowered.compile())


def deep_analysis(log_t, drop_min=1 << 22):
    """The DEEP program at full h1/h2 scale (the stage that compiled to
    25.5 GiB in run4d step_2 via _domain_points' unchunked powers)."""
    import jax.numpy as jnp

    os.environ["HODOR_TREE_DROP_MIN"] = str(drop_min)
    p = _big_prover(log_t)
    ali = p.ali
    ops = p.ops
    t = 1 << log_t
    L = ops.n16
    n_f = t * 16
    n_g = t * ali.max_constraint_power * 16
    m = len(ali.all_masks)
    regs = tuple(mk.register_index for mk in ali.all_masks)
    import jax as _jax

    fn = _jax.jit(ali._deep_traced, static_argnums=(5,))
    sds = lambda *s: jax.ShapeDtypeStruct(s, jnp.uint32)
    lowered = fn.lower(
        sds(2, t, L), sds(2, n_f, L), sds(t * ali.max_constraint_power, L),
        sds(n_g, L),
        {
            "z": sds(L), "alphas": sds(m, L), "roots": sds(m, L),
            "xs_f": sds(n_f, L), "xs_g": sds(n_g, L),
        },
        regs,
    )
    return analyze(lowered.compile())


def powers_analysis(log_n):
    """ops.powers at 2^log_n (the _domain_points builder program)."""
    import jax.numpy as jnp

    from hodor_tpu.field import F_STARK
    from hodor_tpu.field.limbs import ops_for

    ops = ops_for(F_STARK)
    fn = jax.jit(lambda g: ops.powers(g, 1 << log_n))
    lowered = fn.lower(jax.ShapeDtypeStruct((ops.n16,), jnp.uint32))
    return analyze(lowered.compile())


def multihost_plan(log_t=26, n_dev_list=(8, 16, 32), r=2, power=2, lde=16):
    """configs[4] groundwork (VERDICT r04 item 7): per-DEVICE resident
    bytes for every pipeline array of a 2^log_t-row prove sharded over
    n_dev devices, vs the v5e (16 GiB) and v5p (95 GiB) HBM budgets.

    Sharding model (hodor_tpu/parallel + parallel/multihost): evaluation
    domains row-sharded; twiddle/omega tables replicated only at O(sqrt)
    strided-factor size; Merkle trees shard-local subtrees + replicated
    top (tree-dropped above 2^22 leaves, so only values + roots are
    resident); xs domain tables built in-graph (round-5), so temps not
    residents. FRI intermediate values halve per round: sum = 2x l0.
    """
    t = 1 << log_t
    L = 16  # F_STARK u16 limbs held in u32 lanes
    el = L * 4  # bytes per field element
    d = t * power
    h1, h2 = t * lde, d * lde
    rows = []
    for n_dev in n_dev_list:
        per = {
            "witness+coeffs": 2 * r * t * el / n_dev,
            "f_ldes": r * h1 * el / n_dev,
            "g_poly": d * el / n_dev,
            "g_lde": h2 * el / n_dev,
            "h1+h2_lde": (h1 + h2) * el / n_dev,
            "fri_values(~2x l0)": 2 * (h1 + h2) * el / n_dev,
            "tree_roots+small": 64 * 1024,
        }
        total = sum(per.values())
        rows.append({
            "n_dev": n_dev,
            **{k: round(v / GIB, 3) for k, v in per.items()},
            "total_GiB_per_dev": round(total / GIB, 2),
            "fits_v5e_16G": total < 12 * GIB,  # leave 4 GiB for temps
            "fits_v5p_95G": total < 80 * GIB,
        })
    return {"log_t": log_t, "r": r, "power": power, "lde": lde, "rows": rows}


def main():
    # subcommand mode: probe exactly the configs[3]-scale programs that
    # failed on chip (run4c/run4d), one per invocation so a hung compile
    # only loses that probe
    if len(sys.argv) > 1 and not sys.argv[1].isdigit():
        cmd = sys.argv[1]
        arg = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        if cmd == "prove_all":
            # ONE prover init (the expensive part at 2^20 on CPU), then
            # every stage program of the prove compiled+analyzed
            out = {}
            os.environ["HODOR_TREE_DROP_MIN"] = str(1 << 22)
            for name, fn in (
                (f"stage1_{arg}", lambda: stage1_analysis(arg, 1 << 22)),
                (f"calc_g_{arg}", lambda: calc_g_analysis(arg)),
                (f"stage_g_{arg}", lambda: stage_g_analysis(arg, 1 << 22)),
                (f"deep_{arg}", lambda: deep_analysis(arg)),
                (f"fri_{arg + 4}", lambda: fri_chain_analysis(arg + 4, 1 << 22)),
                (f"fri_{arg + 5}", lambda: fri_chain_analysis(arg + 5, 1 << 22)),
            ):
                try:
                    out[name] = fn()
                except Exception as e:  # noqa: BLE001
                    out[name] = {"error": repr(e)[:300]}
                print(json.dumps({name: out[name]}), flush=True)
            print("FINAL", json.dumps(out))
            return
        fns = {
            "stage1": lambda: stage1_analysis(arg, 1 << 22),
            "stage_g": lambda: stage_g_analysis(arg, 1 << 22),
            "calc_g": lambda: calc_g_analysis(arg),
            "deep": lambda: deep_analysis(arg),
            "powers": lambda: powers_analysis(arg),
            "fri": lambda: fri_chain_analysis(arg, 1 << 22),
            "multihost": lambda: multihost_plan(arg),
        }
        res = fns[cmd]()
        print(json.dumps({f"{cmd}_{arg}": res}))
        return
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
