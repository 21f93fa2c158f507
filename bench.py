"""Benchmark: flagship 3D pseudoice Stokes -- operator apply AND full solve.

Two measurements on one chip:

1. The hot kernel (matrix-free parity-layout saddle apply, the SpMV of every
   Krylov iteration -- SURVEY.md section 3.2) timed inside one jit
   (lax.fori_loop): reported as the headline metric in *effective SpMV
   bandwidth* -- the HBM bytes an assembled-CSR SpMV would have to move
   divided by the measured time, as a fraction of the chip's HBM roofline
   (BASELINE.json target >= 0.6; >1 means faster than a perfect-roofline
   assembled SpMV). Honest accounting alongside (extras): the factored
   operator's OWN minimum HBM bytes and the implied achieved bandwidth
   lower bound, plus FLOP throughput.

2. The full ABF solve (exsaddle_tpu/abf.py: FGMRES / fieldsplit-Schur /
   Galerkin-MG / Chebyshev, the abf.opts flagship configuration) to a TRUE
   float64 relative residual of 1e-8 via mixed-precision iterative
   refinement -- end-to-end wall clock, iterations, ms per outer iteration
   (extras "solve_*").

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}
"""

import json
import os
import time

import numpy as np


# Peak HBM bandwidth (GB/s) and bf16 MXU peak (FLOP/s) per chip (public
# specs). Keys are substrings of jax device_kind strings
# ("TPU v5 lite" = v5e, "TPU v5" = v5p, ...).
PEAK_GBS = [
    ("v5 lite", "v5e", 819.0, 197e12),
    ("v5e", "v5e", 819.0, 197e12),
    ("v5p", "v5p", 2765.0, 459e12),
    ("v5", "v5p", 2765.0, 459e12),
    ("v6 lite", "v6e", 1640.0, 918e12),
    ("v6e", "v6e", 1640.0, 918e12),
    ("v4", "v4", 1228.0, 275e12),
]


def _device_peak(dev):
    kind = getattr(dev, "device_kind", "cpu").lower()
    for sub, name, bw, flops in PEAK_GBS:
        if sub in kind:
            return bw, name, flops
    if dev.platform == "tpu":
        return 819.0, "tpu-unknown", None
    return 100.0, "cpu", None   # nominal single-socket figure for local runs


def _build_problem(mx, with_rhs=False):
    from exsaddle_tpu import models as emodels, driver
    from exsaddle_tpu.assembly import (FESpace, project_qp_to_q1,
                                       interp_q1_to_qp, assemble_rhs,
                                       scatter_vector)
    from exsaddle_tpu.mesh import SaddleMesh
    from exsaddle_tpu.options import Options

    opts = Options.from_args(["-model", "11", "-size_x", "0.1"])
    ctx = emodels.ModelContext(opts, 3, log=lambda *a, **k: None)
    mesh = SaddleMesh(3, (mx, mx, mx), (0.1, 1.0, 1.0))
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    nodal = project_qp_to_q1(fes, c)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(fes, nodal))
    out = {"mesh": mesh, "fes": fes, "coeff": coeff, "bc_idx": bc_idx,
           "bc_vals": bc_vals}
    if with_rhs:
        f1, f2 = assemble_rhs(fes, coeff["Fu"], coeff["Fp"])
        F = scatter_vector(mesh, f1, f2)
        F[: mesh.nu][bc_idx] = bc_vals
        out["F_raw"] = F
    return out


def bench_solver_kw(env=True):
    """The tuned mixed-precision IR schedule for the flagship bench solve
    (all knobs env-overridable; defaults from the round-5 sweep on the
    v5e at mx=32, medians of 3 solves per variant):

      abf.opts-faithful inner settings      3.66 s / 28 its
      gcr_rtol 3e-2                         2.99 s / 34 its
      + gcr_restart 12 + cheb_pre_its 4     2.72 s / 35 its
      + inner FGMRES rtol 3e-3              2.54 s / 30 its / 4 rounds
      + inner FGMRES rtol 3e-4              2.11 s / 27 its / 3 rounds
      + refinement loop fused on device     1.96-2.16 s          <- default

    The u-block GCR tolerance loosens 1e-2 -> 3e-2 (the outer flexible
    FGMRES absorbs the weaker inner solve at ~+2 outer its for ~40% less
    V-cycle work per outer it), the GCR truncation window shrinks to the
    iterations actually used (12 > the ~6-9 its/call; identical math,
    less Gram-Schmidt traffic), the V-cycle pre-smooth drops to 4
    Chebyshev its (post stays 8), and the per-round inner FGMRES stops at
    3e-4 -- tight enough that THREE refinement rounds reach the true
    1e-8 target (5e-4 tips into a 4th round: 3.08 s / 38 its; 2e-4 is
    the plateau's other edge at 2.17 s / 28 its). The whole refinement
    loop then runs as ONE jitted while_loop (abf.make_ir_solver) --
    the host-orchestrated round loop paid ~0.3-0.7 s of dispatch gaps.
    The TRUE float64 1e-8 target is unchanged and verified per round. Rejected with evidence: pc_matmul_precision bfloat16 (V-cycle
    quality collapses; inner its explode, 20.2 s at mx=16) and
    tensorfloat32 (42 vs 29 ms/outer at mx=16); fixed-V-cycle u-block
    (u_fixed_vcycles=3: 3.56 s -- outer FGMRES bookkeeping eats the
    V-cycle savings); fgmres restart 16 (re-orthogonalization restarts
    cost iterations); gcr_restart 8 (truncation below the ~6-9 its the
    u-solve needs: 4.94 s); p_cheb_its 10 (2.47 s, +3 outer its).

    env=False ignores the BENCH_* environment overrides and returns the
    committed defaults -- the convergence-anchor tests use this so stale
    sweep variables in a developer's shell cannot shift their bands."""
    if not env:
        return dict(cheb_its=8, rtol=3e-4, gcr_rtol=0.03, gcr_restart=12,
                    cheb_pre_its=4)
    return dict(
        cheb_its=8,
        rtol=float(os.environ.get("BENCH_INNER_RTOL", "3e-4")),
        gcr_rtol=float(os.environ.get("BENCH_GCR_RTOL", "0.03")),
        gcr_restart=int(os.environ.get("BENCH_GCR_RESTART", "12")),
        cheb_pre_its=int(os.environ.get("BENCH_CHEB_PRE", "4")),
    )


def _apply_flops_bytes(mesh, op, itemsize):
    """Exact matmul FLOPs and minimum HBM bytes of one mult_tree apply."""
    nel = mesh.nel
    nud = mesh.ndim * mesh.u_basis
    npb = mesh.p_basis
    nqp = op.nqp
    nqpc = nqp * op.ncomp
    flops = 2 * nel * (nud * nqpc      # xe @ Bs^T
                       + nqpc * nud    # strain @ Bs
                       + npb * nqp     # pe @ Np^T
                       + nqp * nud     # ptmp @ Dm
                       + nud * nqp     # xe @ Dm^T
                       + nqp * npb)    # div @ Np
    flops += nel * (nqpc * 2 + nqp * 3)          # elementwise scalings
    # minimum HBM traffic: per-element coefficient data + x read + y write
    # + keep/mask reads (intermediates that spill add on top of this)
    ndof = mesh.ndof
    bytes_min = (nel * nqpc * itemsize           # scale_visc
                 + 4 * ndof * itemsize)          # x, y, keep, mask
    return flops, bytes_min


def _trace_top_ops(run, n=5):
    """jax.profiler.trace -> top-n ops by total duration from the chrome
    trace. Prefers device-side "XLA Ops" events; falls back to host events
    when device tracing is unavailable (axon tunnel)."""
    import glob
    import gzip
    import json as _json
    import tempfile

    import jax

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            run()
        paths = glob.glob(f"{td}/**/*.trace.json.gz", recursive=True)
        if not paths:
            return "no trace produced"
        data = _json.load(gzip.open(paths[0]))
    evs = data.get("traceEvents", [])
    meta = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in evs if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev_pids = {p for p, nm in meta.items() if "TPU" in nm or "GPU" in nm}
    totals = {}
    src = "device"
    picked = [e for e in evs if e.get("ph") == "X"
              and e.get("pid") in dev_pids]
    if not picked:
        src = "host"
        picked = [e for e in evs if e.get("ph") == "X"]
    for e in picked:
        nm = e.get("name", "?")
        totals[nm] = totals.get(nm, 0.0) + float(e.get("dur", 0.0))
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:n]
    return {"source": src,
            "ops_us": [{"name": k[:80], "total_us": round(v, 1)}
                       for k, v in top]}


def bench_apply(mx, inner, reps):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax
    from exsaddle_tpu.matfree import (ParityMatFreeOperator, assembled_nnz,
                                      tree_aux, to_tree, mult_tree,
                                      tree_norm)

    prob = _build_problem(mx)
    mesh = prob["mesh"]
    bc_mask = np.zeros(mesh.ndof)
    bc_mask[prob["bc_idx"]] = 1.0
    op = ParityMatFreeOperator.build(mesh, prob["fes"], prob["coeff"],
                                     bc_mask, dtype=jnp.float32)
    aux = tree_aux(op)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(mesh.ndof).astype(np.float32))
    tree = to_tree(op, x)

    # --- stabilization without measurement bias (VERDICT r3 item 3b) ----
    # A repeated apply needs bounded magnitudes; a per-iteration
    # norm+rescale costs ~60% of the loop (100 dependent scalar
    # reductions). Instead fold a constant 1/rho into the operator's
    # coefficient data (scale_visc and fac), where rho is the measured
    # dominant growth rate: the timed body is then EXACTLY the production
    # apply -- same HLO, no extra ops -- and iterates converge to the
    # dominant eigenvector with growth ~1.
    @jax.jit
    def norm_applies(op, aux, tree):
        with jax.default_matmul_precision("float32"):
            def body(_, tr):
                y = mult_tree(op, aux, tr)
                n = tree_norm(y)
                return jax.tree.map(lambda a: a / n, y), n
            def step(_, carry):
                tr, _ = carry
                return body(None, tr)
            return lax.fori_loop(0, 30, step, (tree, jnp.float32(1.0)))

    tree, rho = norm_applies(op, aux, tree)
    jax.block_until_ready(tree)
    c = jnp.float32(1.0 / float(rho))
    op_c = dataclasses.replace(op, scale_visc=op.scale_visc * c,
                               fac=op.fac * c)

    @jax.jit
    def applies(op, aux, tree):
        with jax.default_matmul_precision("float32"):
            def body(_, tr):
                return mult_tree(op, aux, tr)
            return lax.fori_loop(0, inner, body, tree)

    out = applies(op_c, aux, tree)
    jax.block_until_ready(out)                   # compile + warm
    # stability audit: the scaled power iteration must stay in a sane
    # float32 range over `inner` applies or the timing is meaningless
    fin = float(tree_norm(out))
    stable = np.isfinite(fin) and 1e-12 < fin < 1e12

    def timed_n(fn, args, n_inner, n_reps=None):
        """(median, min, max) per-iteration seconds over repetitions --
        the spread makes chip run-to-run variance DATA instead of a
        claim (VERDICT r4 weak #2)."""
        o = fn(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(max(n_reps or reps, 5)):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            dt = (time.perf_counter() - t0) / n_inner
            if dt > 2e-6:    # tunnel block_until_ready early-return guard
                ts.append(dt)
        if not ts:
            # fail loudly: a NaN here would flow into every published
            # headline metric as a silently broken measurement
            raise RuntimeError("all benchmark repetitions returned "
                               "instantly (tunnel early-return)")
        return float(np.median(ts)), float(min(ts)), float(max(ts))

    def timed_spread(fn, *args):
        return timed_n(fn, args, inner)

    def timed(fn, *args):
        return timed_spread(fn, *args)[0]

    breakdown = {"power_rho": round(float(rho), 4),
                 "scaled_loop_final_norm": fin}
    if stable:
        # headline: pure production-precision apply, nothing else in the
        # loop body (VERDICT r3 item 3a/3b)
        t_apply, t_apply_min, t_apply_max = timed_spread(
            applies, op_c, aux, tree)
        breakdown["apply_spread_us"] = [round(t_apply_min * 1e6, 2),
                                        round(t_apply * 1e6, 2),
                                        round(t_apply_max * 1e6, 2)]
    else:                                        # pragma: no cover
        breakdown["stability_fallback"] = "norm-rescale loop"
        @jax.jit
        def applies_guard(op, aux, tree):
            with jax.default_matmul_precision("float32"):
                def body(_, tr):
                    y = mult_tree(op, aux, tr)
                    return jax.tree.map(lambda a: a / tree_norm(y), y)
                return lax.fori_loop(0, inner, body, tree)
        t_apply = timed(applies_guard, op, aux, tree)

    nnz = assembled_nnz(mesh)
    csr_bytes = nnz * 8 + 3 * mesh.ndof * 4      # CSR vals+cols + x,y traffic
    flops, bytes_min = _apply_flops_bytes(mesh, op, 4)

    # comparability extras: the bf16 (TPU-default matmul precision)
    # variant, and the round-1..3 norm-stabilized loop
    @jax.jit
    def applies_bf16(op, aux, tree):
        def body(_, tr):
            return mult_tree(op, aux, tr)
        return lax.fori_loop(0, inner, body, tree)

    breakdown["apply_bf16prec_us"] = round(
        timed(applies_bf16, op_c, aux, tree) * 1e6, 2)

    @jax.jit
    def applies_normloop(op, aux, tree):
        with jax.default_matmul_precision("float32"):
            def body(_, tr):
                y = mult_tree(op, aux, tr)
                n = tree_norm(y)
                return jax.tree.map(lambda a: a / n, y)
            return lax.fori_loop(0, inner, body, tree)

    breakdown["apply_normloop_us"] = round(
        timed(applies_normloop, op, aux, tree) * 1e6, 2)

    # --- XLA self-report (VERDICT r2 weak #2/#3: make regressions
    # attributable, report MXU utilization). cost_analysis is the
    # compiler's own flop/byte count for the whole jitted loop ---
    xla = {}
    try:
        # cost-analyze ONE apply (XLA counts a while body once, so the
        # looped executable under-reports by the trip count)
        def one_fn(op, aux, tr):
            with jax.default_matmul_precision("float32"):
                return mult_tree(op, aux, tr)
        one = jax.jit(one_fn)
        compiled = one.lower(op_c, aux, tree).compile()
        ca = compiled.cost_analysis() or {}
        xf = float(ca.get("flops", 0.0))
        xb = float(ca.get("bytes accessed", 0.0))
        mem = compiled.memory_analysis()
        xla = {
            "xla_flops_per_apply": xf,
            "xla_bytes_per_apply": xb,
            "xla_tflops_measured": round(xf / t_apply / 1e12, 3),
            "xla_hbm_gbs_measured": round(xb / t_apply / 1e9, 1),
            "xla_temp_bytes": getattr(mem, "temp_size_in_bytes", None),
            "xla_arg_bytes": getattr(mem, "argument_size_in_bytes", None),
        }
        # fraction of the chip's MXU ceiling (f32 ~ 1/4 of the bf16 peak
        # via multi-pass), keyed by device kind (ADVICE r3)
        dev = jax.devices()[0]
        _, _, peak_bf16 = _device_peak(dev)
        if dev.platform == "tpu" and peak_bf16:
            xla["mxu_util_vs_f32_peak"] = round(
                (xf / t_apply) / (peak_bf16 / 4.0), 3)
    except Exception as e:                        # pragma: no cover
        xla = {"xla_error": f"{type(e).__name__}: {e}"}
    breakdown.update(xla)

    # --- best-effort per-op trace (device events do not cross the axon
    # tunnel; host-side totals still localize dispatch overheads) ---
    try:
        breakdown["trace_top_ops"] = _trace_top_ops(
            lambda: jax.block_until_ready(applies(op_c, aux, tree)))
    except Exception as e:                        # pragma: no cover
        breakdown["trace_top_ops"] = f"{type(e).__name__}: {e}"

    # Roofline argument for the factored apply's ceiling (VERDICT r3
    # item 3): the solver REQUIRES 6-pass f32 matmuls (single-pass bf16
    # degrades outer FGMRES 20 -> 47 its; 3-pass BF16_BF16_F32_X3 was
    # measured to break IR convergence outright), so the MXU ceiling for
    # this kernel is peak_bf16/6 on its matmul FLOPs, and the elementwise
    # gather/scatter legs are HBM-bound. The model below combines both:
    # t_floor = matmul_flops/(peak/6) + min_bytes/peak_bw.
    dev = jax.devices()[0]
    _, _, peak_bf16 = _device_peak(dev)
    peak_bw = _device_peak(dev)[0] * 1e9
    if peak_bf16:
        t_mxu = flops / (peak_bf16 / 6.0)
        t_hbm = bytes_min / peak_bw
        t_floor = t_mxu + t_hbm
        breakdown["roofline"] = {
            "t_floor_us": round(t_floor * 1e6, 1),
            "t_mxu_f32_6pass_us": round(t_mxu * 1e6, 1),
            "t_hbm_min_us": round(t_hbm * 1e6, 1),
            "fraction_of_floor": round(t_floor / t_apply, 3),
            "note": ("6-pass f32 matmul precision is mandatory for "
                     "convergence (bf16: 20->47 outer its; 3-pass: IR "
                     "diverges); the apply ceiling is therefore "
                     "peak_bf16/6 on matmul FLOPs plus HBM-bound "
                     "gather/scatter, not the bf16 MXU peak"),
        }
        # The spec-sheet floor above is NOT what this (tunneled, possibly
        # shared) chip can deliver: calibrate the same roofline against
        # MEASURED peaks, and additionally measure the tightest honest
        # ceiling -- pure chained GEMMs of the APPLY'S OWN SHAPES
        # ((nel,81)@(81,162) + (nel,162)@(162,81) f32-6pass), i.e. the
        # apply with all gather/scatter/coupling/mask work deleted.
        try:
            cal = _device_calibration(timed_n, mesh.nel)
            breakdown["device_calibration"] = cal
            t_mxu_m = flops / (cal["gemm4k_f32_tflops"] * 1e12)
            t_hbm_m = bytes_min / (cal["stream_gbs"] * 1e9)
            t_floor_m = t_mxu_m + t_hbm_m
            breakdown["roofline"]["t_floor_measured_us"] = round(
                t_floor_m * 1e6, 1)
            breakdown["roofline"]["fraction_of_measured_floor"] = round(
                t_floor_m / t_apply, 3)
            breakdown["roofline"]["fraction_of_shape_ceiling"] = round(
                cal["t_2gemm_shape_us"] / (t_apply * 1e6), 3)
        except Exception as e:                    # pragma: no cover
            breakdown["device_calibration"] = f"{type(e).__name__}: {e}"

    return {
        "t_apply_us": round(t_apply * 1e6, 2),
        "spmv_nnz_per_s": round(nnz / t_apply / 1e9, 2),   # Gnnz/s, the
        # BASELINE.json scaling unit (1-chip point; multi-chip needs a pod)
        "effective_csr_gbs": round(csr_bytes / t_apply / 1e9, 1),
        "actual_bytes_min": bytes_min,
        "achieved_gbs_min": round(bytes_min / t_apply / 1e9, 1),
        "apply_tflops": round(flops / t_apply / 1e12, 3),
        "assembled_nnz": nnz,
        "kernel_breakdown": breakdown,
    }


def _device_calibration(timed_n, nel):
    """Measured chip peaks (round-5 finding: through the axon tunnel this
    v5e delivers ~390 GB/s on a 256 MB triad and ~23 TF f32-6pass /
    ~61 TF bf16 on a 4096^3 GEMM -- far below the 819 GB/s / 33 TF / 197
    TF spec numbers the static roofline uses). Also times the exact
    apply-shaped 2-GEMM chain: its small K/N (81->128, 162->256 padding
    plus pipeline effects) caps XLA at ~4-6 TF regardless of how the
    surrounding gather/scatter is written."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    out = {}
    n = 256 * 1024 * 1024 // 4
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    T_IN = 20

    @jax.jit
    def triad(x):
        def body(i, y):
            return y * jnp.float32(0.999) + x * (1e-9 * i.astype(
                jnp.float32))
        return lax.fori_loop(0, T_IN, body, jnp.zeros_like(x))[::65536]

    t, _, _ = timed_n(triad, (x,), T_IN)
    out["stream_gbs"] = round(3 * n * 4 / t / 1e9, 1)
    del x

    m = 4096
    A = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))

    @jax.jit
    def gemm(A, B):
        with jax.default_matmul_precision("float32"):
            def body(i, A):
                return jnp.tanh(A @ B)
            return lax.fori_loop(0, T_IN, body, A)[::512, ::512]

    t, _, _ = timed_n(gemm, (A, B), T_IN)
    out["gemm4k_f32_tflops"] = round(2 * m ** 3 / t / 1e12, 1)
    del A, B

    A = jnp.asarray(rng.standard_normal((nel, 81)).astype(np.float32))
    B1 = jnp.asarray(rng.standard_normal((81, 162)).astype(np.float32))
    B2 = jnp.asarray(rng.standard_normal((162, 81)).astype(np.float32))

    @jax.jit
    def two(A):
        with jax.default_matmul_precision("float32"):
            def body(i, A):
                return ((A @ B1) @ B2) * jnp.float32(0.05)
            return lax.fori_loop(0, 100, body, A)

    t, _, _ = timed_n(two, (A,), 100)
    out["t_2gemm_shape_us"] = round(t * 1e6, 1)
    out["gemm_shape_tflops"] = round(
        2 * nel * (81 * 162 * 2) / t / 1e12, 2)
    return out


def bench_solve(mx, rtol):
    """Full jitted ABF solve (mixed-precision IR to true f64 rtol)."""
    import jax
    import jax.numpy as jnp
    from exsaddle_tpu.abf import ABFSolver

    prob = _build_problem(mx, with_rhs=True)
    mesh = prob["mesh"]
    # enough levels that the replicated dense coarse solve stays small
    nlevels = 3
    while min((g - 1) // 2 ** (nlevels - 1) + 1
              for g in mesh.nn_u) > 12:
        nlevels += 1
    # tuned IR schedule (see bench_solver_kw's measured sweep); the TRUE
    # float64 1e-8 target is unchanged and verified per round
    t0 = time.perf_counter()
    slv = ABFSolver(mesh, prob["fes"], prob["coeff"], prob["bc_idx"],
                    prob["bc_vals"], dtype=jnp.float32, nlevels=nlevels,
                    ir=True, **bench_solver_kw())
    t_setup = time.perf_counter() - t0
    F = prob["F_raw"] + slv.setup["rhs_diri"]
    res = slv.solve_ir(F, rtol=rtol)             # compile + first solve
    # median of 5 with the full spread reported: the tunneled chip shows
    # run-to-run variance (shared tenancy / tunnel latency) up to ~25% on
    # identical programs -- the spread turns that claim into data
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = slv.solve_ir(F, rtol=rtol)
        times.append(time.perf_counter() - t0)
    t_solve = float(np.median(times))
    return {
        "solve_spread_s": [round(min(times), 3), round(t_solve, 3),
                           round(max(times), 3)],
        "solve_mx": mx,
        "solve_nlevels": nlevels,
        "solve_ndof": mesh.ndof,
        "solve_rtol": rtol,
        "solve_converged": bool(res["converged"]),
        "solve_true_rel_resid": res["rnorm"] / res["rnorm0"],
        "solve_seconds": round(t_solve, 3),
        "solve_setup_seconds": round(t_setup, 2),
        "solve_outer_its": res["inner_its"],
        "solve_ir_rounds": res["rounds"],
        "solve_ms_per_outer_it": round(1e3 * t_solve
                                       / max(res["inner_its"], 1), 2),
        # measured budget at mx=32 with the tuned schedule (round-5
        # component profile): each outer FGMRES iteration runs ~6 u-block
        # GCR iterations (gcr_rtol 3e-2); each pays one V-cycle of 13
        # fine applies (4 pre + 8 post Chebyshev + residual; the
        # zero-guess pre-smooth skips its initial apply) at ~0.55 ms plus
        # ~1.5 ms deep-level/transfer work, plus ~1.5 ms GCR window ops
        # (restart 12). Floor ~55 ms/outer on this chip at the apply's
        # measured shape-ceiling; see kernel_breakdown.roofline.
        "solve_budget_note": ("outer it ~= 6 GCR its x (V-cycle: 13 fine "
                              "applies + L-2/deep stencil smooths + "
                              "coarse) + GCR window ops (restart 12); "
                              "measured floor ~55 ms/outer at mx=32 on "
                              "this chip"),
    }


def main():
    import jax
    # float64 must be real for the IR true-residual path (the apply bench
    # keeps explicit float32 dtypes)
    jax.config.update("jax_enable_x64", True)
    # persistent XLA compilation cache: the jitted ABF program (4-level MG
    # inside one while_loop) compiles in ~9 min at mx=32; cached, the
    # bench re-runs in well under the solve time. Verified to work across
    # processes on this backend.
    cache_dir = os.environ.get("BENCH_JAX_CACHE",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)),
                                   ".jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # 0.0: persist even tiny eager-op compiles -- the setup phase
        # dispatches a few dozen small ops whose cold compiles cost ~8 s
        # on this host; all are cache hits on the second process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:                             # pragma: no cover
        pass

    dev = jax.devices()[0]
    peak_gbs, kind, _ = _device_peak(dev)
    on_tpu = dev.platform == "tpu"
    mx = int(os.environ.get("BENCH_MX", "32" if on_tpu else "8"))
    inner = int(os.environ.get("BENCH_INNER", "100" if on_tpu else "10"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    solve_mx = int(os.environ.get("BENCH_SOLVE_MX",
                                  "32" if on_tpu else "6"))
    rtol = float(os.environ.get("BENCH_SOLVE_RTOL", "1e-8"))

    extras = bench_apply(mx, inner, reps)
    solve_ok = False
    try:
        extras.update(bench_solve(solve_mx, rtol))
        solve_ok = bool(extras.get("solve_converged"))
    except Exception as e:                       # pragma: no cover
        extras["solve_error"] = f"{type(e).__name__}: {e}"

    gbs = extras["effective_csr_gbs"]
    if solve_ok:
        # headline: end-to-end flagship solve (the BASELINE.md north star:
        # 3D pseudoice ABF to TRUE f64 rtol 1e-8), with the apply roofline
        # numbers alongside in extras
        print(json.dumps({
            "metric": f"pseudoice3d_abf_solve_mx{solve_mx}"
                      f"_rtol{rtol:g}_{kind}",
            "value": extras["solve_seconds"],
            "unit": "s",
            "vs_baseline": round(gbs / peak_gbs, 3),
            "extras": extras,
        }))
    else:
        # the solve leg failed: the headline SAYS so (VERDICT r2 weak #1)
        print(json.dumps({
            "metric": f"pseudoice3d_SOLVE_FAILED_mx{solve_mx}_{kind}",
            "value": 0.0,
            "unit": "s",
            "vs_baseline": 0.0,
            "extras": extras,
        }))


if __name__ == "__main__":
    main()
