"""Distributed (slab shard_map) ABF solve vs the single-device jitted ABF.

Runs on the 8-virtual-CPU-device mesh from conftest. The distributed
program must reproduce the single-device solve exactly in structure
(identical iteration counts -- the psum-reduced Gram-Schmidt computes the
same scalars up to roundoff) and to 1e-10 in the solution (float64)."""

import numpy as np
import jax
import jax.numpy as jnp

from exsaddle_tpu.options import Options
from exsaddle_tpu import models as emodels, driver
from exsaddle_tpu.assembly import (FESpace, assemble_rhs, scatter_vector,
                                   project_qp_to_q1, interp_q1_to_qp)
from exsaddle_tpu.mesh import SaddleMesh
from exsaddle_tpu.abf import ABFSolver
from exsaddle_tpu.parallel.dist_abf import DistABFSolver


def _setup(m_el, size, model, ndim=3):
    size_names = ["size_x", "size_y", "size_z"]
    args = ["-model", str(model)] + sum(
        (["-" + n, str(v)] for n, v in zip(size_names, size)), [])
    opts = Options.from_args(args)
    ctx = emodels.ModelContext(opts, ndim, log=lambda *a, **k: None)
    mesh = SaddleMesh(ndim, m_el, size)
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, ndim)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    return mesh, fes, coeff, bc_idx, bc_vals


def _rhs(mesh, fes, coeff, bc_idx, bc_vals, rhs_diri):
    f1, f2 = assemble_rhs(fes, coeff["Fu"], coeff["Fp"])
    F = scatter_vector(mesh, f1, f2)
    F[: mesh.nu][bc_idx] = bc_vals
    return F + rhs_diri


def test_dist_abf_matches_serial_8dev():
    mesh, fes, coeff, bc_idx, bc_vals = _setup(
        (4, 4, 8), (0.1, 1.0, 1.0), 11)
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    r1 = slv.solve(F)
    assert r1["reason"] == "CONVERGED_RTOL"

    dslv = DistABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                         jax.devices()[:8], dtype=jnp.float64, nlevels=3)
    rd = dslv.solve(F)
    diff = np.linalg.norm(rd["x"] - r1["x"]) / np.linalg.norm(r1["x"])
    assert diff < 1e-10, diff
    assert rd["its"] == r1["its"]
    # residual histories identical to near-roundoff
    h1 = np.asarray(r1["history"])
    hd = np.asarray(rd["history"][: len(h1)])
    assert np.allclose(h1, hd, rtol=1e-8)


def test_dist_abf_2dev_2d():
    """2D slab decomposition (slab axis = y)."""
    mesh, fes, coeff, bc_idx, bc_vals = _setup(
        (8, 8), (1.0, 0.1), 0, ndim=2)
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    r1 = slv.solve(F)
    dslv = DistABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                         jax.devices()[:2], dtype=jnp.float64, nlevels=3)
    rd = dslv.solve(F)
    diff = np.linalg.norm(rd["x"] - r1["x"]) / np.linalg.norm(r1["x"])
    assert diff < 1e-10, diff
    assert rd["its"] == r1["its"]


def test_dist_abf_lame_3d():
    """3D Lame over the slab decomposition: the sharded A22 weights
    (facp_lam) must reproduce the single-device solve exactly.
    Match: Makefile:438-494 (Lame 3D parallel cases)."""
    from exsaddle_tpu import models as emodels
    from exsaddle_tpu.options import Options
    opts = Options.from_args(["-model", "6", "-lambda1", "10"])
    ctx = emodels.ModelContext(opts, 3, lame=True,
                               log=lambda *a, **k: None)
    mesh = SaddleMesh(3, (4, 4, 4), (1.0, 1.0, 1.0))
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals, lame=True,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    r1 = slv.solve(F)
    assert r1["reason"] == "CONVERGED_RTOL"
    dslv = DistABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                         jax.devices()[:4], lame=True,
                         dtype=jnp.float64, nlevels=3)
    rd = dslv.solve(F)
    diff = np.linalg.norm(rd["x"] - r1["x"]) / np.linalg.norm(r1["x"])
    assert diff < 1e-10, diff
    assert rd["its"] == r1["its"]
