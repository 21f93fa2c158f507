"""Full distributed ABF on the cartesian N-D device mesh (parallel/cart_abf):
per-shard setup, per-axis ppermute halos, psum Gram-Schmidt, replicated
coarse -- must reproduce the single-device jitted ABF solve exactly
(identical iteration counts, 1e-10 agreement) on multi-axis meshes.

Match: femixedspace.c:1154-1161 (DMDA rank grids in every dimension),
femixedspace.c:2306-2647 (per-rank assembly)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exsaddle_tpu import models as emodels, driver
from exsaddle_tpu.assembly import (FESpace, assemble_rhs, scatter_vector,
                                   project_qp_to_q1, interp_q1_to_qp)
from exsaddle_tpu.mesh import SaddleMesh
from exsaddle_tpu.options import Options
from exsaddle_tpu.abf import ABFSolver
from exsaddle_tpu.parallel.cart import CartPartition
from exsaddle_tpu.parallel.cart_abf import CartABFSolver, build_cart_abf


def _problem(m_el):
    opts = Options.from_args(["-model", "11", "-size_x", "0.1"])
    ctx = emodels.ModelContext(opts, 3, lame=False, log=lambda *a, **k: None)
    mesh = SaddleMesh(3, m_el, (0.1, 1.0, 1.0))
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    return ctx, mesh, fes, coeff, bc_idx, bc_vals


def _rhs(mesh, fes, coeff, bc_idx, bc_vals, rhs_diri):
    f1, f2 = assemble_rhs(fes, coeff["Fu"], coeff["Fp"])
    F = scatter_vector(mesh, f1, f2)
    F[: mesh.nu][bc_idx] = bc_vals
    return F + rhs_diri


@pytest.fixture(scope="module")
def single_448():
    ctx, mesh, fes, coeff, bc_idx, bc_vals = _problem((4, 4, 8))
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    res = slv.solve(F)
    assert res["reason"] == "CONVERGED_RTOL"
    return ctx, mesh, bc_idx, bc_vals, F, res


@pytest.mark.slow
@pytest.mark.parametrize("dev_shape", [(1, 2, 4), (2, 2, 2), (1, 1, 8)])
def test_cart_abf_matches_single_device(single_448, dev_shape):
    ctx, mesh, bc_idx, bc_vals, F, res1 = single_448
    if dev_shape == (2, 2, 2):
        # (2,2,2) needs a cubic element split; re-solve on (4,4,4)
        ctx, mesh, fes, coeff, bc_idx, bc_vals = _problem((4, 4, 4))
        slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                        dtype=jnp.float64, nlevels=3)
        F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
        res1 = slv.solve(F)
    part = CartPartition(mesh, dev_shape)
    ndev = int(np.prod(dev_shape))
    cslv = CartABFSolver(part, ctx, bc_idx, bc_vals,
                         jax.devices()[:ndev], dtype=jnp.float64,
                         nlevels=3, check_vma=True)
    resd = cslv.solve(F)
    assert resd["state"] == 2                      # CONVERGED_RTOL
    assert resd["its"] == res1["its"]
    diff = (np.linalg.norm(resd["x"] - res1["x"])
            / np.linalg.norm(res1["x"]))
    assert diff < 1e-10, diff


def test_per_shard_setup_is_local(single_448):
    """VERDICT r2 item 3: distributed setup never materializes a global
    element batch; the per-device element count is nel/ndev, and the
    operator data is the FACTORED form (O(nel nqp ncomp)), not dense
    (nel, 81, 81) blocks (item 4)."""
    ctx, mesh, bc_idx, bc_vals, _, _ = single_448
    part = CartPartition(mesh, (1, 2, 4))
    dcfg, ddata, setup = build_cart_abf(part, ctx, bc_idx, bc_vals,
                                        dtype=jnp.float64, nlevels=3)
    nel_loc = mesh.nel // 8
    sv = np.asarray(ddata["scale_visc"])
    # stacked (devz, devy, devx, nel_loc, nqp*ncomp): factored, per-shard
    # (flat trailing dim: no relayout between the apply's two matmuls)
    assert sv.shape == (4, 2, 1, nel_loc, 27 * 6)
    assert np.asarray(ddata["pscale"]).shape == (4, 2, 1, nel_loc, 27)


def test_cart_abf_lame_3d():
    """VERDICT r3 item 5: 3D Lame runs on the cartesian distributed path
    and matches the single-device jitted ABFSolver (identical iteration
    counts, 1e-10 agreement) on the virtual 8-device mesh.
    Match: Makefile:438-494 (Lame 3D parallel cases)."""
    opts = Options.from_args(["-model", "6", "-lambda1", "10"])
    ctx = emodels.ModelContext(opts, 3, lame=True, log=lambda *a, **k: None)
    mesh = SaddleMesh(3, (4, 4, 8), (1.0, 1.0, 1.0))
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals, lame=True,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    res1 = slv.solve(F)
    assert res1["reason"] == "CONVERGED_RTOL"

    part = CartPartition(mesh, (2, 2, 2))
    cslv = CartABFSolver(part, ctx, bc_idx, bc_vals, jax.devices()[:8],
                         lame=True, dtype=jnp.float64, nlevels=3,
                         check_vma=True)
    resd = cslv.solve(F)
    assert resd["state"] == 2
    assert resd["its"] == res1["its"]
    diff = (np.linalg.norm(resd["x"] - res1["x"])
            / np.linalg.norm(res1["x"]))
    assert diff < 1e-10, diff


def test_cart_abf_2d():
    """2D cartesian distributed ABF (the reference's 2D 2-rank family,
    e.g. exSaddle2d_ar at mpiexec -n 2): (2,2) device grid matches the
    single-device solve exactly."""
    opts = Options.from_args(["-model", "0"])
    ctx = emodels.ModelContext(opts, 2, lame=False,
                               log=lambda *a, **k: None)
    mesh = SaddleMesh(2, (8, 8), (1.0, 0.1))
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 2)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                    dtype=jnp.float64, nlevels=3)
    F = _rhs(mesh, fes, coeff, bc_idx, bc_vals, slv.setup["rhs_diri"])
    res1 = slv.solve(F)
    assert res1["reason"] == "CONVERGED_RTOL"

    part = CartPartition(mesh, (2, 2))
    cslv = CartABFSolver(part, ctx, bc_idx, bc_vals, jax.devices()[:4],
                         dtype=jnp.float64, nlevels=3, check_vma=True)
    resd = cslv.solve(F)
    assert resd["state"] == 2
    assert resd["its"] == res1["its"]
    diff = (np.linalg.norm(resd["x"] - res1["x"])
            / np.linalg.norm(res1["x"]))
    assert diff < 1e-10, diff


def test_cart_rhs_diri_matches_global(single_448):
    ctx, mesh, bc_idx, bc_vals, _, _ = single_448
    fes = FESpace(mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, 3)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(
        fes, project_qp_to_q1(fes, c)))
    slv = ABFSolver(mesh, fes, coeff, bc_idx, bc_vals,
                    dtype=jnp.float64, nlevels=3)
    part = CartPartition(mesh, (1, 2, 2))
    _, _, setup = build_cart_abf(part, ctx, bc_idx, bc_vals,
                                 dtype=jnp.float64, nlevels=3)
    assert np.allclose(setup["rhs_diri"], slv.setup["rhs_diri"],
                       atol=1e-12)
