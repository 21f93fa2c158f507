"""Tests for the secondary entry points: ex23 (tridiagonal KSP smoke test,
ex23mod.c) and ex42 (3D Q1-Q1 stabilized Stokes, ex42mod.c). The reference
ships no golden outputs for these, so assertions are structural: solver
behavior, discrete conservation, stabilization effect, output formats."""

import re

import numpy as np
import scipy.sparse as sp

from exsaddle_tpu.options import Options
from exsaddle_tpu.ex23 import solve_ex23
from exsaddle_tpu.ex42 import solve_stokes_3d_coupled, Ex42Problem


def _collect():
    lines = []
    return lines, (lambda m="": lines.append(str(m)))


def test_ex23_default_matches_exact_solution():
    lines, log = _collect()
    res, err = solve_ex23(Options.from_args(["-n", "50"]), log=log)
    assert err < 1e-10
    assert lines == []          # silent when error below tol (ex23mod.c:241)


def test_ex23_custom_pcs():
    for pc in ("ildl", "ilupack", "jacobi", "ilu"):
        lines, log = _collect()
        res, err = solve_ex23(
            Options.from_args(f"-n 40 -pc_type {pc}".split()), log=log)
        assert err < 1e-9, pc


def test_ex42_isoviscous_solves_and_is_divergence_free():
    opts = Options.from_args(
        "-model 0 -stokes_ksp_rtol 1e-9 "
        "-stokes_fieldsplit_u_ksp_type preonly "
        "-stokes_fieldsplit_u_pc_type lu "
        "-stokes_fieldsplit_p_ksp_type preonly "
        "-stokes_fieldsplit_p_pc_type jacobi".split())
    r = solve_stokes_3d_coupled(6, 6, 6, opts, log=lambda *a, **k: None)
    assert r["result"].reason == "CONVERGED_RTOL"
    prob = r["prob"]
    X = np.asarray(r["X"])
    # the discrete continuity equation (with stabilization) is satisfied:
    # check the p-rows of the residual directly
    resid = prob.F - prob.A @ X
    assert np.abs(resid[3::4]).max() < 1e-8
    # free-slip: normal velocities vanish on constrained faces
    nx, ny, nz = prob.nn
    gi = np.arange(prob.nnodes) % nx
    u = X[0::4]
    assert np.abs(u[gi == 0]).max() < 1e-12
    assert np.abs(u[gi == nx - 1]).max() < 1e-12
    # free surface: w on the top face is NOT constrained
    gk = np.arange(prob.nnodes) // (nx * ny)
    w = X[2::4]
    assert np.abs(w[gk == nz - 1]).max() > 1e-6


def test_ex42_sinker_and_block_monitor_format():
    lines, log = _collect()
    opts = Options.from_args(
        "-model 1 -stokes_ksp_rtol 1e-6 -stokes_pc_type ilu "
        "-stokes_ksp_max_it 500 -stokes_ksp_monitor_blocks".split())
    r = solve_stokes_3d_coupled(5, 5, 5, opts, log=log)
    assert r["result"].reason == "CONVERGED_RTOL"
    mon = [ln for ln in lines if "KSP Component" in ln]
    assert len(mon) >= 2
    pat = (r"\s*\d+ KSP Component U,V,W,P residual norm \[ "
           r"\d\.\d+e[-+]\d+, \d\.\d+e[-+]\d+, \d\.\d+e[-+]\d+, "
           r"\d\.\d+e[-+]\d+ \]")
    assert re.match(pat, mon[0]), mon[0]
    # block residuals decrease
    first = [float(v) for v in re.findall(r"\d\.\d+e[-+]\d+", mon[0])]
    last = [float(v) for v in re.findall(r"\d\.\d+e[-+]\d+", mon[-1])]
    assert sum(last) < 1e-4 * max(sum(first), 1e-30)


def test_ex42_pvts_multipiece_writer(tmp_path, monkeypatch):
    """VERDICT r3 item 10: the DAView3DPVTS multi-piece parallel writer
    (ex42mod.c:1033-1337) -- one .pvts master + per-virtual-rank .vts slab
    pieces whose extents tile the whole grid and whose values round-trip."""
    import re
    monkeypatch.chdir(tmp_path)
    opts = Options.from_args(
        "-model 0 -write_pvts -pvts_ranks 3 "
        "-stokes_fieldsplit_u_ksp_type preonly "
        "-stokes_fieldsplit_u_pc_type lu "
        "-stokes_fieldsplit_p_ksp_type preonly "
        "-stokes_fieldsplit_p_pc_type jacobi".split())
    r = solve_stokes_3d_coupled(4, 4, 6, opts, log=lambda *a, **k: None)
    master = tmp_path / "ex42-up.pvts"
    assert master.exists()
    txt = master.read_text()
    exts = re.findall(r'<Piece Extent="([\d -]+)" Source="([^"]+)"', txt)
    assert len(exts) == 3
    nn = r["prob"].nn
    assert f'WholeExtent="0 {nn[0]-1} 0 {nn[1]-1} 0 {nn[2]-1}"' in txt
    # pieces tile the z axis with shared interface planes
    zlims = [tuple(int(v) for v in e.split()[4:6]) for e, _ in exts]
    assert zlims[0][0] == 0 and zlims[-1][1] == nn[2] - 1
    for (a, b), (c, d) in zip(zlims, zlims[1:]):
        assert b == c
    # values round-trip: reassemble P from pieces == solution pressure
    X = np.asarray(r["X"])
    P = X[3::4].reshape(nn[2], nn[1], nn[0])
    for (e, src), (z0, z1) in zip(exts, zlims):
        piece = (tmp_path / src).read_text()
        m = re.search(r'Name="P"[^>]*>\s*([^<]+)<', piece)
        vals = np.fromstring(m.group(1), sep=" ")
        assert np.allclose(vals.reshape(z1 - z0 + 1, nn[1], nn[0]),
                           P[z0:z1 + 1], atol=1e-6 * abs(P).max() + 1e-12)


def test_ex42_stabilization_matters():
    """Without the Bochev term the Q1-Q1 pressure block is zero (the
    discretization is unstable); with it the p-p block is nonzero and
    renders the system solvable."""
    opts = Options.from_args(["-model", "0"])
    prob = Ex42Problem(4, 4, 4, opts, log=lambda *a, **k: None)
    pd = prob.p_dofs
    C = prob.A[pd][:, pd]
    assert abs(C).max() > 0
    lines, log = _collect()
    opts2 = Options.from_args(["-model", "0", "-no_stab"])
    prob2 = Ex42Problem(4, 4, 4, opts2, log=log)
    assert any("without the stabilization term" in ln for ln in lines)
    C2 = prob2.A[pd][:, pd]
    assert abs(C2).max() == 0


def test_ex42_matrix_is_symmetric():
    opts = Options.from_args(["-model", "1"])
    prob = Ex42Problem(3, 3, 3, opts, log=lambda *a, **k: None)
    d = abs(prob.A - prob.A.T)
    assert d.max() < 1e-13


def test_ksp_view_tree_structure():
    """-saddle_ksp_view prints the PETSc-format solver tree (the structure
    asserted by testref/exSaddle3d_pseudoice_1.ref:28+)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from refcompare import run_case
    lines, _ = run_case(
        "-options_file /root/reference/abf.opts -model 11 -size_x 0.1 -mx 4 "
        "-saddle_ksp_view -saddle_ksp_max_it 2", ndim=3)
    txt = "\n".join(lines)
    for frag in [
            "KSP Object: (saddle_) 1 MPI processes",
            "type: fgmres",
            "using Classical (unmodified) Gram-Schmidt Orthogonalization "
            "with no iterative refinement",
            "happy breakdown tolerance 1e-30",
            "right preconditioning",
            "using UNPRECONDITIONED norm type for convergence test",
            "FieldSplit with Schur preconditioner, factorization UPPER",
            "Preconditioner for the Schur complement formed from user "
            "provided matrix",
            "KSP solver for A00 block",
            "KSP Object: (saddle_fieldsplit_u_) 1 MPI processes",
            "type is MULTIPLICATIVE, levels=3 cycles=v",
            "Using Galerkin computed coarse grid matrices",
            "Coarse grid solver -- level",
            "Down solver (pre-smoother) on level 1",
            "Up solver (post-smoother) same as down solver (pre-smoother)",
            "KSP solver for S = A11 - A10 inv(A00) A01",
            "KSP Object: (saddle_fieldsplit_p_) 1 MPI processes",
            "type: bjacobi",
            "number of blocks = 1",
    ]:
        assert frag in txt, frag


def test_yaml_options_file():
    """-options_file_yaml parses the reference's nested example.yml
    (exSaddle.c:169-177): flat and nested keys land in the options table."""
    from exsaddle_tpu.options import Options
    opts = Options.from_args(
        ["-options_file_yaml", "/root/reference/example.yml"])
    assert opts.get_int("mx", 0) == 8
    assert opts.get_bool("mg", False)
    assert opts.get_int("nlevels", 0) == 3
    assert opts.get_string("ksp_type", None,
                           prefix="saddle_mg_levels_") == "gmres"
    assert opts.has("ksp_view", prefix="saddle_")
