"""Benchmark: flagship 3D pseudoice Stokes saddle SpMV on one chip.

Measures the hot kernel of every Krylov iteration (SURVEY.md section 3.2:
SpMV inside smoothing dominates runtime) -- the element-batched saddle
operator apply y = A x -- and reports achieved HBM bandwidth as a fraction
of the device roofline (BASELINE.json target: >=60% of roofline).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
`vs_baseline` = achieved_bytes_per_s / peak_HBM_bytes_per_s.
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


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_flagship

    dev = jax.devices()[0]
    peak_gbs, kind = _device_peak(dev)
    on_tpu = dev.platform == "tpu"
    mx = int(os.environ.get("BENCH_MX", "20" if on_tpu else "8"))
    reps = int(os.environ.get("BENCH_REPS", "50" if on_tpu else "10"))

    mesh, op, F = _build_flagship(mx=mx, dtype=jnp.float32)
    mult = jax.jit(op.mult)
    x = F / jnp.maximum(jnp.linalg.norm(F), 1e-30)
    y = mult(x)
    jax.block_until_ready(y)          # compile + warm cache

    t0 = time.perf_counter()
    for _ in range(reps):
        x = mult(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps

    # Bytes moved per apply: every operator block + index map is read once,
    # x is read (gathered) and y written.
    data = [op.A11, op.A12, op.A21, op.A22, op.u_el_dofs, op.p_el_nodes,
            op.bc_mask, F, F]
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in data)
    gbs = nbytes / dt / 1e9

    print(json.dumps({
        "metric": f"pseudoice3d_spmv_bandwidth_mx{mx}_{kind}",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbs / peak_gbs, 4),
    }))


if __name__ == "__main__":
    main()
