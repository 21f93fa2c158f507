"""Distributed slab decomposition tests on the 8-virtual-device CPU mesh:
sharded operator apply and fully-jitted distributed FGMRES must agree with
the single-device paths to f64 roundoff (the analogue of the reference's
serial-vs-parallel norm agreement, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from exsaddle_tpu import models as emodels, driver
from exsaddle_tpu.assembly import FESpace, assemble_element_matrices
from exsaddle_tpu.mesh import SaddleMesh
from exsaddle_tpu.operator import apply_dirichlet_elimination
from exsaddle_tpu.options import Options
from exsaddle_tpu.parallel import (AXIS, SlabPartition, SlabOperator,
                                   make_dist_mult, make_dist_fgmres)


def _build(nd, m_el, lame=False, model="0", size=None):
    opts = Options.from_args(["-model", model])
    ctx = emodels.ModelContext(opts, nd, lame=lame, log=lambda *a, **k: None)
    mesh = SaddleMesh(nd, m_el, size or (1.0,) * nd)
    fes = FESpace(mesh)
    bci, bcv = emodels.create_bc_list(ctx, mesh)
    c = emodels.evaluate_coefficients(
        ctx, fes.qp_coords.reshape(-1, nd)).reshape(mesh.nel, fes.nqp, -1)
    coeff = driver._qp_dict(ctx, c)
    elm = assemble_element_matrices(fes, coeff, lame=lame)
    op, rhs, bc_mask, xbc = apply_dirichlet_elimination(mesh, elm, bci, bcv)
    return mesh, op


def _dmesh(ndev):
    devs = jax.devices()[:ndev]
    assert len(devs) == ndev
    return Mesh(np.array(devs), (AXIS,))


CASES = [(2, (3, 8), False, "0", None, 4),
         (3, (3, 4, 8), False, "11", (0.1, 1.0, 1.0), 8),
         (3, (2, 3, 4), True, "6", None, 2)]


@pytest.mark.parametrize("nd,m_el,lame,model,size,ndev", CASES)
def test_dist_mult_matches_serial(nd, m_el, lame, model, size, ndev):
    mesh, op = _build(nd, m_el, lame, model, size)
    part = SlabPartition(mesh, ndev)
    dmesh = _dmesh(ndev)
    sop = SlabOperator.build(part, op)
    sop = part.device_put(dmesh, sop)

    x = np.random.default_rng(0).standard_normal(mesh.ndof)
    xs = part.device_put(dmesh, part.shard_vector(x))
    mult = make_dist_mult(dmesh)
    y = part.unshard_vector(jax.tree.map(np.asarray, mult(sop, xs)))
    y_ref = np.asarray(op.mult(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() < 1e-12 * np.abs(y_ref).max()

    # consistency: both redundant copies of interface planes agree
    ys = mult(sop, xs)
    u = np.asarray(ys["u"])
    for d in range(1, ndev):
        np.testing.assert_allclose(u[d, 0], u[d - 1, -1], rtol=0, atol=1e-13)


def test_dist_fgmres_matches_serial_compiled():
    from exsaddle_tpu.compiled import make_fgmres_cycle

    mesh, op = _build(3, (3, 4, 8), False, "11", (0.1, 1.0, 1.0))
    ndev = 8
    part = SlabPartition(mesh, ndev)
    dmesh = _dmesh(ndev)
    sop = part.device_put(dmesh, SlabOperator.build(part, op))

    F = np.random.default_rng(1).standard_normal(mesh.ndof)
    d = np.asarray(op.diagonal())
    inv = 1.0 / np.where(d == 0.0, 1.0, d)

    Fs = part.device_put(dmesh, part.shard_vector(F))
    invs = part.device_put(dmesh, part.shard_vector(inv))
    zeros = part.device_put(dmesh, part.shard_vector(np.zeros(mesh.ndof)))

    k = 10
    solve = make_dist_fgmres(dmesh, k)
    xs, rn = solve(sop, invs, Fs, zeros)
    x_dist = part.unshard_vector(jax.tree.map(np.asarray, xs))

    cycle = jax.jit(make_fgmres_cycle(
        op.mult, lambda v: jnp.asarray(inv) * v, k))
    x_ser, rn_ser = cycle(jnp.asarray(F), jnp.zeros(mesh.ndof))
    assert abs(float(rn) - float(rn_ser)) < 1e-10 * float(rn_ser) + 1e-14
    assert np.abs(x_dist - np.asarray(x_ser)).max() < 1e-10


def test_indivisible_slab_errors():
    mesh, op = _build(2, (3, 7))
    with pytest.raises(ValueError, match="not.*divisible|divisible"):
        SlabPartition(mesh, 2)
