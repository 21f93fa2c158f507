"""Benchmark: flagship 3D pseudoice Stokes saddle operator apply on one chip.

Measures the hot kernel of every Krylov iteration (SURVEY.md section 3.2:
SpMV inside smoothing dominates runtime) using the matrix-free parity-layout
apply (exsaddle_tpu/matfree.py). The loop of applies runs INSIDE one jit
(lax.fori_loop) -- per-dispatch tunnel overhead (~0.6 ms on this image) would
otherwise dominate, and the production solver path is fully jitted too.

Reported as *effective SpMV bandwidth*: the HBM bytes an assembled-CSR SpMV
would have to move (8 B/nnz + vectors) divided by the measured per-apply
time, as a fraction of the chip's HBM roofline. The matrix-free apply moves
far less data than that, so vs_baseline > 1.0 means faster than a
perfect-roofline assembled SpMV (BASELINE.json target: >= 0.6).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import time

import numpy as np


# Peak HBM bandwidth per chip, GB/s (public specs). Keys are substrings of
# jax device_kind strings ("TPU v5 lite" = v5e, "TPU v5" = v5p, ...).
PEAK_GBS = [
    ("v5 lite", "v5e", 819.0),
    ("v5e", "v5e", 819.0),
    ("v5p", "v5p", 2765.0),
    ("v5", "v5p", 2765.0),
    ("v6 lite", "v6e", 1640.0),
    ("v6e", "v6e", 1640.0),
    ("v4", "v4", 1228.0),
]


def _device_peak(dev):
    kind = getattr(dev, "device_kind", "cpu").lower()
    for sub, name, bw in PEAK_GBS:
        if sub in kind:
            return bw, name
    if dev.platform == "tpu":
        return 819.0, "tpu-unknown"
    return 100.0, "cpu"   # nominal single-socket figure for local runs


def build_operator(mx, dtype):
    from exsaddle_tpu import models as emodels, driver
    from exsaddle_tpu.assembly import FESpace
    from exsaddle_tpu.mesh import SaddleMesh
    from exsaddle_tpu.options import Options
    from exsaddle_tpu.matfree import ParityMatFreeOperator

    opts = Options.from_args(["-model", "11"])
    ctx = emodels.ModelContext(opts, 3, log=lambda *a, **k: None)
    mesh = SaddleMesh(3, (mx, mx, mx), (0.1, 1.0, 1.0))
    fes = FESpace(mesh)
    bci, _ = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, c)
    bc_mask = np.zeros(mesh.ndof)
    bc_mask[bci] = 1.0
    return mesh, ParityMatFreeOperator.build(mesh, fes, coeff, bc_mask,
                                             dtype=dtype)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from exsaddle_tpu.matfree import assembled_nnz

    dev = jax.devices()[0]
    peak_gbs, kind = _device_peak(dev)
    on_tpu = dev.platform == "tpu"
    mx = int(os.environ.get("BENCH_MX", "32" if on_tpu else "8"))
    inner = int(os.environ.get("BENCH_INNER", "100" if on_tpu else "10"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    mesh, op = build_operator(mx, jnp.float32)

    from exsaddle_tpu.matfree import (tree_aux, to_tree, mult_tree,
                                      tree_norm)

    # Everything is a jit ARGUMENT, not a closure constant (closure device
    # arrays re-upload per call through this image's TPU tunnel), and
    # vectors stay in tree (grid) form for the whole loop -- flat-vector
    # relayouts cost ~9x at mx=32.
    @jax.jit
    def applies(op, aux, tree):
        def body(_, tr):
            y = mult_tree(op, aux, tr)
            n = tree_norm(y)                     # keep magnitudes bounded
            return jax.tree.map(lambda a: a / n, y)
        return lax.fori_loop(0, inner, body, tree)

    aux = tree_aux(op)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(mesh.ndof).astype(np.float32))
    tree = to_tree(op, x)
    tree = applies(op, aux, tree)
    jax.block_until_ready(tree)                  # compile + warm

    # median of reps, discarding physically-impossible timings (the tunnel
    # occasionally returns early from block_until_ready)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(applies(op, aux, tree))
        dt = (time.perf_counter() - t0) / inner
        if dt > 2e-6:
            times.append(dt)
    if not times:
        raise RuntimeError("all benchmark repetitions returned instantly")
    best = float(np.median(times))

    nnz = assembled_nnz(mesh)
    eff_bytes = nnz * 8 + 3 * mesh.ndof * 4      # CSR vals+cols + x,y traffic
    gbs = eff_bytes / best / 1e9

    print(json.dumps({
        "metric": f"pseudoice3d_effective_spmv_bw_mx{mx}_{kind}",
        "value": round(gbs, 1),
        "unit": "GB/s",
        "vs_baseline": round(gbs / peak_gbs, 3),
    }))


if __name__ == "__main__":
    main()
