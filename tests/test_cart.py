"""Cartesian N-D device-mesh decomposition tests (parallel/cart.py).

The reference decomposes the node grid along EVERY dimension into a
cartesian rank grid (femixedspace.c:1154-1161); these tests run the
per-shard-assembled operator and the jitted distributed FGMRES cycle over
2D (2x2), 3D (2x2x2) and mixed (1x2x4-style) device meshes of virtual CPU
devices, and require agreement with the single-device element-batched
operator to float64 roundoff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exsaddle_tpu import models as emodels
from exsaddle_tpu.assembly import (FESpace, assemble_element_matrices,
                                   assemble_rhs, scatter_vector,
                                   project_qp_to_q1, interp_q1_to_qp)
from exsaddle_tpu.operator import apply_dirichlet_elimination
from exsaddle_tpu.mesh import SaddleMesh
from exsaddle_tpu.options import Options
from exsaddle_tpu.parallel.cart import (CartPartition, CartOperator,
                                        make_cart_mult, make_cart_fgmres)
from exsaddle_tpu import driver


def _problem(ndim, m_el, model="11"):
    size = (0.1,) + (1.0,) * (ndim - 1)
    opts = Options.from_args(["-model", model, "-size_x", "0.1"])
    ctx = emodels.ModelContext(opts, ndim, lame=False,
                               log=lambda *a, **k: None)
    mesh = SaddleMesh(ndim, m_el, size)
    fes = FESpace(mesh)
    bc_idx, bc_vals = emodels.create_bc_list(ctx, mesh)
    pts = fes.qp_coords.reshape(-1, ndim)
    c = emodels.evaluate_coefficients(ctx, pts).reshape(
        mesh.nel, fes.nqp, -1)
    nodal = project_qp_to_q1(fes, c)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(fes, nodal))
    elm = assemble_element_matrices(fes, coeff, lame=False)
    op, rhs_diri, bc_mask, _ = apply_dirichlet_elimination(
        mesh, elm, bc_idx, bc_vals)
    return mesh, ctx, bc_idx, op


def _check_mult_agreement(ndim, m_el, dev_shape, model="11"):
    mesh, ctx, bc_idx, op = _problem(ndim, m_el, model)
    part = CartPartition(mesh, dev_shape)
    dmesh = part.device_mesh(jax.devices())
    cop = CartOperator.build(part, ctx, bc_idx, dtype=jnp.float64)
    cop = jax.tree.map(
        lambda a: part.device_put(dmesh, a)
        if isinstance(a, jnp.ndarray) else a, cop,
        is_leaf=lambda a: isinstance(a, jnp.ndarray))

    rng = np.random.default_rng(3)
    x = rng.standard_normal(mesh.ndof)
    y_ref = np.asarray(op.mult(jnp.asarray(x)))

    sh = part.device_put(dmesh, part.shard_vector(x))
    mult = make_cart_mult(dmesh, ndim)
    y = part.unshard_vector(jax.tree.map(np.asarray, mult(cop, sh)))
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err
    return mesh, ctx, part, dmesh, cop, op


def test_cart_mult_2d_2x2():
    _check_mult_agreement(2, (4, 4), (2, 2), model="0")


def test_cart_mult_3d_2x2x2():
    """Full 3D cartesian decomposition: halos exchanged along all three
    axes (sequential per-axis ppermute handles edges/corners)."""
    _check_mult_agreement(3, (2, 2, 4), (1, 2, 4)[:3])


def test_cart_mult_3d_mixed_axes():
    _check_mult_agreement(3, (2, 4, 2), (2, 2, 2))


def test_cart_fgmres_matches_single_device():
    """One jitted distributed FGMRES(8)+Jacobi cycle over a 2x2x2 mesh
    equals the same cycle computed densely on one device."""
    ndim, m_el, dev_shape = 3, (2, 2, 4), (2, 2, 2)
    mesh, ctx, part, dmesh, cop, op = _check_mult_agreement(
        ndim, m_el, dev_shape)

    fes = FESpace(mesh)
    pts = fes.qp_coords.reshape(-1, ndim)
    c = emodels.evaluate_coefficients(ctx, pts).reshape(
        mesh.nel, fes.nqp, -1)
    nodal = project_qp_to_q1(fes, c)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(fes, nodal))
    f1, f2 = assemble_rhs(fes, coeff["Fu"], coeff["Fp"])
    F = scatter_vector(mesh, f1, f2)

    diag = np.asarray(op.diagonal())
    inv_diag = 1.0 / np.where(diag == 0.0, 1.0, diag)

    solve = make_cart_fgmres(dmesh, ndim, k=8)
    shF = part.device_put(dmesh, part.shard_vector(F))
    shd = part.device_put(dmesh, part.shard_vector(inv_diag))
    shx0 = part.device_put(dmesh, part.shard_vector(np.zeros(mesh.ndof)))
    x, rnorm = solve(cop, shd, shF, shx0)
    x = part.unshard_vector(jax.tree.map(np.asarray, x))

    # host reference: same fixed-iteration FGMRES cycle
    from exsaddle_tpu.compiled import make_fgmres_cycle
    cyc = make_fgmres_cycle(op.mult,
                            lambda v: jnp.asarray(inv_diag) * v, 8)
    x_ref, rnorm_ref = cyc(jnp.asarray(F), jnp.zeros(mesh.ndof))
    x_ref = np.asarray(x_ref)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-11
    assert abs(float(rnorm) - float(rnorm_ref)) / float(rnorm_ref) < 1e-11


def test_per_shard_assembly_matches_global():
    """assemble_local_blocks: per-box local assembly (shifted-quadrature
    coefficient evaluation) reproduces the sharded global element batch."""
    from exsaddle_tpu.parallel.cart import assemble_local_blocks
    ndim, m_el, dev_shape = 3, (2, 2, 2), (2, 1, 2)
    mesh, ctx, bc_idx, _ = _problem(ndim, m_el)
    part = CartPartition(mesh, dev_shape)

    fes = FESpace(mesh)
    pts = fes.qp_coords.reshape(-1, ndim)
    c = emodels.evaluate_coefficients(ctx, pts).reshape(
        mesh.nel, fes.nqp, -1)
    nodal = project_qp_to_q1(fes, c)
    coeff = driver._qp_dict(ctx, interp_q1_to_qp(fes, nodal))
    elm = assemble_element_matrices(fes, coeff, lame=False)

    local = assemble_local_blocks(part, ctx)
    # re-stack the global batch into boxes and compare: the ghost-ring
    # local projection reproduces the global projection exactly
    for name in ("A11", "A12", "A22"):
        if elm[name] is None:               # Stokes: A22 = 0
            assert not np.asarray(local[name]).any()
            continue
        mg = np.asarray(elm[name]).reshape(
            tuple(reversed(mesh.m_el)) + elm[name].shape[1:])
        for box in part.dev_boxes():
            sl = tuple(slice(box[d] * part.mloc[d],
                             (box[d] + 1) * part.mloc[d])
                       for d in reversed(range(ndim)))
            ref_blk = mg[sl].reshape((-1,) + elm[name].shape[1:])
            got = np.asarray(local[name])[tuple(reversed(box))]
            scale = np.abs(ref_blk).max()
            np.testing.assert_allclose(got, ref_blk, rtol=1e-12,
                                       atol=1e-13 * scale)
