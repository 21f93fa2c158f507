"""Sweep ABF solver configs at BENCH-like settings; report time/its.
Usage: python _exp_sweep.py <mx> <name=json-kwargs> [...]"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from exsaddle_tpu.abf import ABFSolver, make_abf_solver
from bench import _build_problem
import dataclasses


def main():
    mx = int(sys.argv[1])
    variants = []
    for a in sys.argv[2:]:
        name, kw = a.split("=", 1)
        variants.append((name, json.loads(kw)))

    prob = _build_problem(mx, with_rhs=True)
    mesh = prob["mesh"]
    nlevels = 3
    while min((g - 1) // 2 ** (nlevels - 1) + 1 for g in mesh.nn_u) > 12:
        nlevels += 1
    t0 = time.perf_counter()
    slv = ABFSolver(mesh, prob["fes"], prob["coeff"], prob["bc_idx"],
                    prob["bc_vals"], dtype=jnp.float32, nlevels=nlevels,
                    ir=True, cheb_its=8, rtol=1e-3)
    print(f"setup {time.perf_counter()-t0:.1f} s nlevels={nlevels}",
          flush=True)
    F = prob["F_raw"] + slv.setup["rhs_diri"]
    base_cfg = slv.cfg

    for name, kw in variants:
        cfg = dataclasses.replace(base_cfg, **kw)
        slv.cfg = cfg
        slv._solve = jax.jit(make_abf_solver(cfg))
        t0 = time.perf_counter()
        res = slv.solve_ir(F, rtol=1e-8)       # compile + warm
        t_first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = slv.solve_ir(F, rtol=1e-8)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(json.dumps({
            "variant": name, "mx": mx, "t_solve": round(t, 3),
            "t_range": [round(min(ts), 3), round(max(ts), 3)],
            "first": round(t_first, 1),
            "its": res["inner_its"], "rounds": res["rounds"],
            "conv": bool(res["converged"]),
            "rel": res["rnorm"] / res["rnorm0"],
            "ms_outer": round(1e3 * t / max(res["inner_its"], 1), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
