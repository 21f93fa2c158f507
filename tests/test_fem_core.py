"""Unit tests for the mesh / basis / assembly / operator core.

Gates (SURVEY.md section 7, step 2): the assembled operator must agree with
the reference's weak form -- verified here via FE identities and the MMS
(model 101) discretization-error gate from testref/exSaddle2d_mms_1.ref.
"""

import numpy as np
import pytest

from exsaddle_tpu import basis, quadrature
from exsaddle_tpu.mesh import SaddleMesh
from exsaddle_tpu.assembly import (FESpace, assemble_element_matrices,
                                   assemble_rhs, assemble_schur_pre,
                                   scatter_vector, project_qp_to_q1,
                                   interp_q1_to_qp)
from exsaddle_tpu.operator import apply_dirichlet_elimination, SaddleOperator
from exsaddle_tpu.models import (ModelContext, evaluate_coefficients,
                                 unpack_coefficients, create_bc_list,
                                 compute_reference_solution)
from exsaddle_tpu.options import Options


def _quiet(*a, **k):
    pass


def test_basis_partition_of_unity():
    for nd in (2, 3):
        pts, wts = quadrature.gauss_tensor(nd)
        assert np.isclose(wts.sum(), 2.0 ** nd)
        N2, dN2 = basis.tabulate_q2(pts)
        N1, dN1 = basis.tabulate_q1(pts)
        assert np.allclose(N2.sum(axis=1), 1.0)
        assert np.allclose(N1.sum(axis=1), 1.0)
        assert np.allclose(dN2.sum(axis=2), 0.0, atol=1e-14)
        assert np.allclose(dN1.sum(axis=2), 0.0, atol=1e-14)


def test_mesh_counts_and_maps():
    mesh = SaddleMesh(2, (3, 2), (1.0, 1.0))
    assert mesh.n_u_nodes == 7 * 5
    assert mesh.n_p_nodes == 4 * 3
    assert mesh.nel == 6
    assert mesh.u_el_nodes.shape == (6, 9)
    assert mesh.p_el_nodes.shape == (6, 4)
    # element 0 corner Q2 nodes
    assert list(mesh.u_el_nodes[0][:3]) == [0, 1, 2]
    assert mesh.u_el_nodes[0][3] == 7
    # element (1,1) = index 1 + 1*3 = 4; its Q1 nodes
    assert list(mesh.p_el_nodes[4]) == [5, 6, 9, 10]
    # coordinates
    assert np.allclose(mesh.u_coords[-1], [1.0, 1.0])
    assert np.allclose(mesh.p_coords[5], [1.0 / 3.0, 1.0 / 2.0])


@pytest.mark.parametrize("nd", [2, 3])
def test_operator_symmetry_and_nullspaces(nd):
    m_el = (2, 2) if nd == 2 else (2, 2, 2)
    mesh = SaddleMesh(nd, m_el, tuple([1.0] * nd))
    fes = FESpace(mesh)
    nqp = fes.nqp
    eta = 1.0 + np.arange(mesh.nel * nqp).reshape(mesh.nel, nqp) * 0.01
    elm = assemble_element_matrices(fes, {"eta": eta}, lame=False)
    op, rhs, bc_mask, x_bc = apply_dirichlet_elimination(
        mesh, elm, np.array([], dtype=np.int64), np.array([]))
    A = op.to_dense()
    assert np.allclose(A, A.T, atol=1e-12)
    # constant velocity field is in the kernel of A11 and of the divergence
    x = np.zeros(mesh.ndof)
    x[0:mesh.nu:nd] = 1.0
    y = np.asarray(op.mult(x))
    assert np.allclose(y, 0.0, atol=1e-11)
    # constant pressure acts only via boundary terms of A12 (divergence thm):
    # interior velocity rows must vanish
    x = np.zeros(mesh.ndof)
    x[mesh.nu:] = 1.0
    y = np.asarray(op.mult(x))
    interior = np.ones(mesh.n_u_nodes, dtype=bool)
    g = mesh.u_coords
    for d in range(nd):
        interior &= (g[:, d] > 1e-9) & (g[:, d] < 1.0 - 1e-9)
    for d in range(nd):
        yi = y[d:mesh.nu:nd][interior]
        assert np.allclose(yi, 0.0, atol=1e-12)


def test_viscous_energy_exact():
    """For u = (x, -y) (div-free linear field), the viscous bilinear form
    u^T A11 u = int 2 eta (e:e) dV = int 2*(1+1) dV = 4 * |Omega| (2D,
    eta=1)."""
    mesh = SaddleMesh(2, (3, 3), (1.0, 1.0))
    fes = FESpace(mesh)
    eta = np.ones((mesh.nel, fes.nqp))
    elm = assemble_element_matrices(fes, {"eta": eta})
    op, _, _, _ = apply_dirichlet_elimination(
        mesh, elm, np.array([], dtype=np.int64), np.array([]))
    x = np.zeros(mesh.ndof)
    x[0:mesh.nu:2] = mesh.u_coords[:, 0]
    x[1:mesh.nu:2] = -mesh.u_coords[:, 1]
    energy = x @ np.asarray(op.mult(x))
    assert np.isclose(energy, 4.0, rtol=1e-12)


def test_schur_mass_matrix_value():
    """sum_ij S_ij = -int (1/eta) dV."""
    mesh = SaddleMesh(2, (4, 4), (2.0, 1.0))
    fes = FESpace(mesh)
    eta = np.full((mesh.nel, fes.nqp), 2.0)
    S = assemble_schur_pre(fes, {"eta": eta})
    total = S.sum()
    assert np.isclose(total, -2.0 * 1.0 / 2.0, rtol=1e-12)


def test_q1_projection_roundtrip():
    """Projecting a Q1-representable field to nodes and back to qp is exact."""
    mesh = SaddleMesh(2, (3, 3), (1.0, 1.0))
    fes = FESpace(mesh)
    xy = fes.qp_coords  # (nel, nqp, 2)
    f = (2.0 * xy[..., 0] - 0.5 * xy[..., 1])[..., None]
    nodal = project_qp_to_q1(fes, f)
    expect = 2.0 * mesh.p_coords[:, 0] - 0.5 * mesh.p_coords[:, 1]
    # the reference's projection is lumped (femixedspace.c:1984-2018): exact
    # only at interior nodes; boundary nodes are one-sided weighted averages
    g = mesh.p_coords
    interior = ((g[:, 0] > 1e-9) & (g[:, 0] < 1 - 1e-9)
                & (g[:, 1] > 1e-9) & (g[:, 1] < 1 - 1e-9))
    assert np.allclose(nodal[interior, 0], expect[interior], atol=1e-12)
    # constant fields project exactly everywhere and roundtrip exactly
    fc = np.full_like(f, 3.25)
    nodal_c = project_qp_to_q1(fes, fc)
    assert np.allclose(nodal_c, 3.25, atol=1e-12)
    assert np.allclose(interp_q1_to_qp(fes, nodal_c), 3.25, atol=1e-12)


def test_mms_discretization_error_matches_reference():
    """End-to-end assembly gate vs testref/exSaddle2d_mms_1.ref:9,14.

    Solve the mx=16 MMS1 system with a direct solve; the discretization
    error vs the nodally interpolated exact solution must match the
    reference (rel 2.3274e-05 full, 1.20852e-06 velocity)."""
    mesh = SaddleMesh(2, (16, 16), (1.0, 1.0))
    fes = FESpace(mesh)
    opts = Options.from_args(["-model", "101"])
    ctx = ModelContext(opts, 2, lame=False, log=_quiet)

    # coefficient pipeline: evaluate at qp, project to Q1, back to qp
    pts = fes.qp_coords.reshape(-1, 2)
    c = evaluate_coefficients(ctx, pts).reshape(mesh.nel, fes.nqp, -1)
    nodal = project_qp_to_q1(fes, c)
    cq = interp_q1_to_qp(fes, nodal)
    cd = unpack_coefficients(ctx, cq.reshape(-1, cq.shape[-1]))
    eta = cd["eta"].reshape(mesh.nel, fes.nqp)
    Fu = cd["Fu"].reshape(mesh.nel, fes.nqp, 2)
    Fp = cd["Fp"].reshape(mesh.nel, fes.nqp)

    elm = assemble_element_matrices(fes, {"eta": eta})
    bc_idx, bc_vals = create_bc_list(ctx, mesh)
    op, rhs_diri, bc_mask, x_bc = apply_dirichlet_elimination(
        mesh, elm, bc_idx, bc_vals)
    f1, f2 = assemble_rhs(fes, Fu, Fp)
    F = scatter_vector(mesh, f1, f2)
    F[:mesh.nu][bc_idx] = bc_vals
    F = F + rhs_diri

    A = op.to_dense()
    # regularize the constant-pressure nullspace with a rank-one term, solve,
    # then project the nullspace component out (much cheaper than lstsq)
    null = np.zeros(mesh.ndof)
    null[mesh.nu:] = 1.0 / np.sqrt(mesh.np_)
    X = np.linalg.solve(A + np.outer(null, null), F)

    Xref = compute_reference_solution(ctx, mesh)
    Xref = Xref - (Xref @ null) * null
    X = X - (X @ null) * null

    err = np.linalg.norm(Xref - X)
    rel = err / np.linalg.norm(Xref)
    assert np.isclose(rel, 2.3274e-05, rtol=1e-3), rel
    erru = np.linalg.norm((Xref - X)[:mesh.nu])
    relu = erru / np.linalg.norm(Xref[:mesh.nu])
    assert np.isclose(relu, 1.20852e-06, rtol=1e-3), relu
