"""Fully-jitted ABF (Approximate Block Factorization) saddle solver.

The flagship solver configuration (abf.opts:1-16 wired by exSaddle.c:303-422)
as ONE traced computation: FGMRES(30, right PC, unpreconditioned norm) over
fieldsplit-Schur-UPPER, whose u-block is GCR(rtol 1e-2) preconditioned by a
Galerkin-MG V-cycle with Chebyshev(8)/Jacobi smoothers and a dense coarse
solve, and whose p-block is a fixed Chebyshev polynomial in the
Jacobi-preconditioned viscosity-scaled pressure mass matrix (the
spectrally-equivalent, device-friendly stand-in for PETSc's serial
bjacobi+ILU(0) on Mpscaled, abf.opts:14-15).

Everything below `ABFSolver.solve` runs on device inside `lax.while_loop`s
with on-device convergence tests -- no host scalar pulls in the iteration
(the hot loop of SURVEY.md section 3.2). Vectors live in the parity-permuted
tree layout of matfree.ParityMatFreeOperator: a list of 2^nd velocity parity
subgrids plus the Q1 pressure grid, so every element gather/scatter and
every MG transfer is a unit-stride slice / pad-add.

Multigrid structure (match: -saddle_fieldsplit_u_pc_mg_galerkin, abf.opts:13):
  - fine level: the factored matrix-free A00 apply (matfree.py);
  - level fine-1: EXACT Galerkin apply in factored form
        A_1 = P^T A_fine P  applied as  restrict . A_fine . prolong
    (P = DMDA multilinear interpolation, which in the parity layout is a
    pure slice-average: coarse nodes ARE parity class 0);
  - deeper levels: 3^nd-point block stencils extracted from the host
    Galerkin RAP products (no jax.experimental.sparse anywhere);
  - coarsest: replicated dense solve with a precomputed inverse
    (PCREDUNDANT + LU equivalent; Makefile:276).
"""

import itertools
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from exsaddle_tpu import treeops
from exsaddle_tpu.grid_ops import _gather_q1, _scatter_q1
from exsaddle_tpu.matfree import (ParityMatFreeOperator, parity_permutation,
                                  mult_tree, tree_aux, to_tree, from_tree)
from jax.lax import optimization_barrier as _ob


# --------------------------------------------------------------------------
# Block applies on the parity operator (the fieldsplit blocks of the
# BC-eliminated saddle matrix, as PETSc's MatCreateSubMatrix extracts them)
# --------------------------------------------------------------------------

def mult_u_tree(op, aux, subs, halo_u=None):
    """A00 x_u: velocity block with keep/mask Dirichlet elimination
    (unit diagonal on BC rows). halo_u: optional post-scatter
    interface-plane exchange (distributed slabs, parallel/dist_abf.py)."""
    ks, ms, _, _ = aux
    nel = int(np.prod(op.m_el))
    xe = _ob(op._gather_u([s * k for s, k in zip(subs, ks)]))
    strain = _ob(xe @ op.Bs.T).reshape(nel, op.nqp, op.ncomp)
    yue = _ob((strain * op.scale_visc).reshape(nel, -1) @ op.Bs)
    outs = op._scatter_u(yue)
    if halo_u is not None:
        outs = halo_u(outs)
    return [o * k + m * s for o, k, m, s in zip(outs, ks, ms, subs)]


def mult_up_tree(op, aux, pg, halo_u=None):
    """A01 x_p: pressure-gradient block into u space (BC rows zeroed)."""
    ks, _, _, _ = aux
    pe = _ob(_gather_q1(pg, op.m_el))
    ptmp = _ob(pe @ op.Np.T)
    yue = -_ob((ptmp * op.fac[None, :]) @ op.Dm)
    outs = op._scatter_u(yue)
    if halo_u is not None:
        outs = halo_u(outs)
    return [o * k for o, k in zip(outs, ks)]


def mult_pu_tree(op, aux, subs, halo_p=None):
    """A10 x_u: divergence block into p space (BC columns zeroed)."""
    ks, _, _, _ = aux
    xe = _ob(op._gather_u([s * k for s, k in zip(subs, ks)]))
    div = _ob(xe @ op.Dm.T)
    ype = -(div * op.fac[None, :]) @ op.Np
    yp = _scatter_q1(ype, op.m_el, op.nn_p)
    return yp if halo_p is None else halo_p(yp)


def mp_apply(op, pscale, pg, halo_p=None):
    """Mpscaled x_p: viscosity-scaled pressure mass matrix in factored form
    (MatAssemble_Schur weights, femixedspace.c:2837-2948).
    pscale: (nel, nqp) = -w_q detJp (1/eta) [Lame: (1/lambda + 1/mu)]."""
    pe = _ob(_gather_q1(pg, op.m_el))
    ptmp = (pe @ op.Np.T) * pscale
    yp = _scatter_q1(ptmp @ op.Np, op.m_el, op.nn_p)
    return yp if halo_p is None else halo_p(yp)


# --------------------------------------------------------------------------
# MG transfers
# --------------------------------------------------------------------------

def _class_bits(p, nd):
    return [(p >> a) & 1 for a in range(nd)]


def prolong_parity(xc, cls_shapes, m_el):
    """Multilinear interpolation coarse grid -> fine parity subgrids.

    xc: (*rev(m+1 per axis), nd). Coarse nodes coincide with fine parity
    class 0; a fine node with parity bits b averages its 2^{popcount(b)}
    coarse neighbors -- every term a unit-stride slice."""
    nd = len(m_el)
    subs = []
    for p, shp in enumerate(cls_shapes):
        bits = _class_bits(p, nd)
        w = 0.5 ** sum(bits)
        acc = None
        for deltas in itertools.product(*[range(b + 1) for b in bits]):
            idx = tuple(
                slice(deltas[nd - 1 - dim], deltas[nd - 1 - dim]
                      + shp[dim]) for dim in range(nd)) + (slice(None),)
            piece = xc[idx]
            acc = piece if acc is None else acc + piece
        subs.append(w * acc)
    return subs


def restrict_parity(subs, cls_shapes, m_el):
    """Transpose of prolong_parity: fine parity subgrids -> coarse grid."""
    nd = len(m_el)
    cshape = tuple(m_el[nd - 1 - dim] + 1 for dim in range(nd))
    dt = subs[0].dtype
    out = jnp.zeros(cshape + (subs[0].shape[-1],), dt)
    zero = jnp.array(0.0, dt)
    for p, shp in enumerate(cls_shapes):
        bits = _class_bits(p, nd)
        w = 0.5 ** sum(bits)
        for deltas in itertools.product(*[range(b + 1) for b in bits]):
            pads = [(deltas[nd - 1 - dim],
                     cshape[dim] - shp[dim] - deltas[nd - 1 - dim], 0)
                    for dim in range(nd)] + [(0, 0, 0)]
            out = out + w * lax.pad(subs[p], zero, pads)
    return out


def prolong_grid(xc, fine_shape):
    """Separable multilinear interpolation between plain node grids
    (spatial dims leading, dof trailing). fine_shape: spatial shape of the
    output. Matches precond_mg.Prolongation for (M+1)/2-coarsened grids."""
    x = xc
    nd = len(fine_shape)
    for dim in range(nd):
        x = _prolong_axis(x, dim, fine_shape[dim])
    return x


def _prolong_axis(x, axis, nf):
    x = jnp.moveaxis(x, axis, 0)
    a = x                                     # even fine slots
    b = 0.5 * (x[:-1] + x[1:])                # odd fine slots
    inter = jnp.stack([a[:-1], b], axis=1).reshape((-1,) + x.shape[1:])
    out = jnp.concatenate([inter, a[-1:]], axis=0)
    assert out.shape[0] == nf
    return jnp.moveaxis(out, 0, axis)


def restrict_grid(rf, coarse_shape):
    """Transpose of prolong_grid."""
    x = rf
    nd = len(coarse_shape)
    for dim in range(nd):
        x = _restrict_axis(x, dim, coarse_shape[dim])
    return x


def _restrict_axis(x, axis, nc):
    x = jnp.moveaxis(x, axis, 0)
    r = x[::2]
    odd = 0.5 * x[1::2]
    zero = jnp.array(0.0, x.dtype)
    pads = [(0, 0, 0)] * x.ndim
    lo = list(pads); lo[0] = (0, 1, 0)
    hi = list(pads); hi[0] = (1, 0, 0)
    r = r + lax.pad(odd, zero, lo) + lax.pad(odd, zero, hi)
    assert r.shape[0] == nc
    return jnp.moveaxis(r, 0, axis)


# --------------------------------------------------------------------------
# Block stencil operator (deep Galerkin levels)
# --------------------------------------------------------------------------

def stencil_from_csr(A_csr, grid_shape, nd):
    """Extract a 3^ndim-point block stencil from an assembled operator on a
    structured node grid with nd dofs per node (Galerkin RAP of a Q1-type
    operator stays within the 3^ndim-point pattern).

    grid_shape: spatial (reversed: z,y,x) node counts.
    Returns W: (*grid_shape, 3^ndim, nd, nd) with W[..., s, i, j] the
    coupling to the neighbor at offset s (offsets x-fastest, -1..1)."""
    ndim = len(grid_shape)
    nn = tuple(reversed(grid_shape))          # per-axis counts, x first
    nnod = int(np.prod(nn))
    A = A_csr.tocsr()
    # node coordinates in x-fastest linear order
    coords = np.stack(np.meshgrid(*[np.arange(n) for n in nn],
                                  indexing="ij"), axis=-1).reshape(-1, ndim)
    lin = np.zeros(nnod, dtype=np.int64)
    mult = 1
    for d in range(ndim):
        lin += coords[:, d] * mult
        mult *= nn[d]
    coords = coords[np.argsort(lin)]          # coords[i] of node i
    W = np.zeros(grid_shape + (3 ** ndim, nd, nd))
    Wl = W.reshape(nnod, 3 ** ndim, nd, nd)
    # offset enumeration x-fastest (itertools.product varies the LAST
    # factor fastest, so flip)
    offs = [tuple(reversed(o))
            for o in itertools.product(*[(-1, 0, 1)] * ndim)]
    for s, off in enumerate(offs):
        nbr = coords + np.asarray(off)
        ok = np.all((nbr >= 0) & (nbr < np.asarray(nn)), axis=1)
        nlin = np.zeros(nnod, dtype=np.int64)
        mult = 1
        for d in range(ndim):
            nlin += np.clip(nbr[:, d], 0, nn[d] - 1) * mult
            mult *= nn[d]
        rows_ok = np.nonzero(ok)[0]
        for i in range(nd):
            for j in range(nd):
                r = nd * rows_ok + i
                c = nd * nlin[rows_ok] + j
                vals = np.asarray(A[r, c]).ravel()
                Wl[rows_ok, s, i, j] = vals
    return W


def stencil_apply(W, x):
    """y = A x for a block stencil operator. x: (*grid_shape, nd)."""
    ndim = x.ndim - 1
    nd = x.shape[-1]
    zero = jnp.array(0.0, x.dtype)
    xp = lax.pad(x, zero, [(1, 1, 0)] * ndim + [(0, 0, 0)])
    shape = x.shape[:-1]
    offs = [tuple(reversed(o))
            for o in itertools.product(*[(-1, 0, 1)] * ndim)]
    y = jnp.zeros_like(x)
    for s, off in enumerate(offs):
        # off is x-fastest (axis order x,y,z); array dims are reversed
        idx = tuple(slice(1 + off[ndim - 1 - dim],
                          1 + off[ndim - 1 - dim] + shape[dim])
                    for dim in range(ndim))
        y = y + jnp.einsum("...ij,...j->...i", W[..., s, :, :], xp[idx])
    return y


# --------------------------------------------------------------------------
# Setup
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class ABFConfig:
    """Static solver configuration (baked into the trace)."""
    ndim: int
    nlevels: int = 3
    restart: int = 30
    rtol: float = 1e-5
    atol: float = 1e-50
    dtol: float = 1e4
    max_it: int = 10000
    hist_len: int = 256
    gcr_rtol: float = 1e-2
    gcr_restart: int = 30
    gcr_max_it: int = 200
    cheb_its: int = 8
    p_cheb_its: int = 12
    # TPU MXU matmul precision for every dot_general in the solve trace.
    # The TPU default ("bfloat16", one MXU pass) perturbs the operator and
    # the Gram-Schmidt dots by ~1e-3 relative, which degrades the outer
    # FGMRES from the reference's ~20 iterations to 47 (mx=6) / 175 (mx=12)
    # measured on v5e. "float32" (6-pass) restores f64-equivalent counts;
    # the element-apply matmuls are bandwidth-bound so the extra MXU passes
    # are nearly free.
    matmul_precision: str = "float32"
    # grid metadata (filled by build)
    cls_shapes: tuple = ()
    m_el: tuple = ()
    level_grids: tuple = ()     # reversed spatial node shapes, coarse->fine


def _esteig_bounds(apply_fn, diag, n, transform=(0.0, 0.2, 0.0, 1.1)):
    """Setup-phase Chebyshev eigenvalue estimation: identical to the host
    path (krylov.KSP._estimate_eigenvalues + the esteig transform), so the
    jitted and host solvers use the same bounds."""
    from exsaddle_tpu.krylov import KSP, KSPConfig
    from exsaddle_tpu.precond import PCJacobi
    pc = PCJacobi(jnp.asarray(diag))
    cfg = KSPConfig(type="gmres", rtol=1e-12, max_it=10, restart=30,
                    pc_side="left", norm_type="preconditioned")
    ksp = KSP(apply_fn, pc, cfg)
    noisy = jnp.asarray(np.sin(np.arange(n, dtype=np.float64)))
    ksp.solve(noisy)
    H = ksp.last_hessenberg
    it = H.shape[1]
    ev = np.linalg.eigvals(H[:it, :it])
    emin_est, emax_est = float(ev.real.min()), float(ev.real.max())
    a, b, c, d = transform
    return a * emin_est + b * emax_est, c * emin_est + d * emax_est


def build_abf(mesh, fes, coeff_qp, bc_idx, bc_vals, lame=False,
              dtype=jnp.float64, nlevels=3, cfg_kw=None, A00_csr=None):
    """Build (config, data, F_tree, x_bc_info) for the jitted ABF solve.

    Host setup mirrors the reference's: element assembly, Galerkin RAP for
    the coarse matrix (scipy, setup only), Chebyshev esteig per level, and
    the Mpscaled weights. Returns (cfg, data) where data is a pytree of
    device arrays (pass as jit arguments)."""
    from exsaddle_tpu.assembly import (assemble_element_matrices,
                                       assemble_schur_pre)
    from exsaddle_tpu.operator import apply_dirichlet_elimination
    from exsaddle_tpu.precond_mg import Prolongation

    nd = mesh.ndim
    elm = assemble_element_matrices(fes, coeff_qp, lame=lame)
    sop, rhs_diri, bc_mask, x_bc = apply_dirichlet_elimination(
        mesh, elm, bc_idx, bc_vals, device=False)
    pop = ParityMatFreeOperator.build(mesh, fes, coeff_qp, bc_mask,
                                      lame=lame, dtype=dtype)
    aux = tree_aux(pop)
    perm, iperm = parity_permutation(mesh)

    # velocity-grid hierarchy (fine -> coarse), DMDA (M+1)/2 coarsening
    grids = [tuple(mesh.nn_u)]
    for _ in range(nlevels - 1):
        grids.append(tuple((m + 1) // 2 for m in grids[-1]))
    grids = grids[::-1]                      # coarsest first
    for g in grids:
        assert all(n >= 2 for n in g), "too many MG levels for this mesh"

    import scipy.sparse as sp
    prolongs = [Prolongation(grids[k], grids[k + 1], nd)
                for k in range(nlevels - 1)]
    from exsaddle_tpu.precond_mg import galerkin_coarse_operators
    nu = mesh.nu
    ue = np.asarray(mesh.u_el_dofs)
    A11k = np.asarray(sop.A11)                 # BC-masked element batch
    bc_u = np.asarray(bc_mask)[:nu]
    if A00_csr is not None:
        # explicit fine CSR supplied (host PC paths): classic chain
        coarse_csrs = galerkin_coarse_operators(A00_csr, prolongs)
        fine_diag = A00_csr.diagonal()
        fine_apply = (lambda v: jnp.asarray(A00_csr @ np.asarray(v)))
    else:
        # CSR-free fine level: assembling the global saddle CSR + one
        # giant SpGEMM dominated setup (measured 25 s of 50 s at mx=20,
        # ~120 s at mx=32). The same quantities come straight from the
        # element batch:
        #  - Jacobi diagonal: scatter-add of the element diagonals;
        #  - esteig apply: gather -> batched element matvec -> scatter;
        #  - L-2 Galerkin matrix: per-element dense RAP. The interpolation
        #    row of any fine node inside an element is supported entirely
        #    on that element's corners (trilinear weights vanish on the
        #    others), so P_loc^T A_e P_loc summed over elements equals
        #    P^T A P exactly (up to summation order).
        fine_diag = bc_u.copy()
        np.add.at(fine_diag, ue.ravel(),
                  np.einsum("eii->ei", A11k).ravel())

        def fine_apply(v):
            x = np.asarray(v)
            y = bc_u * x
            ye = np.einsum("eij,ej->ei", A11k, x[ue])
            np.add.at(y, ue.ravel(), ye.ravel())
            return jnp.asarray(y)

        P_f = prolongs[-1].to_scipy().tocsr()
        # element-corner dofs on the L-2 grid (same ordering as P columns)
        mels = np.asarray(mesh.m_el)
        nn1 = mels + 1                          # L-2 nodes per dim
        egrid = np.stack(np.meshgrid(
            *[np.arange(m) for m in reversed(mels)], indexing="ij"),
            -1)[..., ::-1].reshape(-1, nd)      # element x-fastest
        corners = np.stack(np.meshgrid(
            *[np.arange(2)] * nd, indexing="ij"),
            -1)[..., ::-1].reshape(-1, nd)      # local corner x-fastest
        cnode = egrid[:, None, :] + corners[None, :, :]
        lin = cnode[..., 0]
        mult = nn1[0]
        for d_ in range(1, nd):
            lin = lin + cnode[..., d_] * mult
            mult *= nn1[d_]
        uc = (lin[..., None] * nd
              + np.arange(nd)[None, None, :]).reshape(len(egrid), -1)
        # P restricted to element 0 (identical for every element on the
        # uniform grid; verified in tests against other elements)
        P_loc = np.asarray(P_f[np.ix_(ue[0], uc[0])].todense())
        A1e = np.einsum("ia,eij,jb->eab", P_loc, A11k, P_loc,
                        optimize=True)
        n1 = int(np.prod(grids[-2])) * nd
        r1 = np.broadcast_to(uc[:, :, None], A1e.shape).ravel()
        c1 = np.broadcast_to(uc[:, None, :], A1e.shape).ravel()
        A1 = sp.coo_matrix((A1e.ravel(), (r1, c1)),
                           shape=(n1, n1)).tocsr()
        A1 = A1 + (P_f.T.multiply(bc_u)) @ P_f   # BC unit-diag RAP term
        A1 = A1.tocsr()
        coarse_csrs = galerkin_coarse_operators(A1, prolongs[:-1]) + [A1]

    # per-level Jacobi diagonals + esteig bounds (levels coarsest..finest;
    # smoothers live on levels 1..nlevels-1)
    diags, bounds = [], []
    for k in range(1, nlevels):
        if k == nlevels - 1:
            d = fine_diag
            apply_fn = fine_apply
            n_lvl = nu
        else:
            A = coarse_csrs[k]
            d = A.diagonal()
            apply_fn = (lambda v, A=A: jnp.asarray(A @ np.asarray(v)))
            n_lvl = A.shape[0]
        d = np.where(d == 0.0, 1.0, d)
        emin, emax = _esteig_bounds(apply_fn, d, n_lvl)
        diags.append(d)
        bounds.append((emin, emax))

    # coarse inverse (PCREDUNDANT + stable dense LU stand-in for UMFPACK)
    A0 = coarse_csrs[0].toarray()
    coarse_inv = np.linalg.inv(A0)

    # deep-level stencils (levels 1..nlevels-2 excluding the factored
    # fine-1 level which is applied as R A_fine P)
    lvl_grids = [tuple(reversed(g)) for g in grids]   # reversed (z,y,x)
    stencils = []
    for k in range(1, nlevels - 2):
        stencils.append(stencil_from_csr(coarse_csrs[k], lvl_grids[k], nd))

    # fine-level Jacobi diagonal in parity tree form
    d_fine = diags[-1][perm[: mesh.nu]]
    inv_fine_flat = 1.0 / d_fine
    # split into parity subgrids
    def split_u(xu):
        subs = []
        off = 0
        for s in pop.cls_shapes:
            n = int(np.prod(s))
            subs.append(jnp.asarray(
                xu[off * nd:(off + n) * nd].reshape(s + (nd,)), dtype))
            off += n
        return subs
    inv_diag_fine = split_u(inv_fine_flat)

    # level diagonals as grids (z,y,x,nd), coarsest+1 .. fine-1
    inv_diag_lvls = []
    for k in range(1, nlevels - 1):
        d = diags[k - 1]
        inv_diag_lvls.append(jnp.asarray(
            (1.0 / d).reshape(lvl_grids[k] + (nd,)), dtype))

    # Schur p-block: Mpscaled factored weights + Jacobi + Chebyshev bounds
    if lame:
        inv = 1.0 / coeff_qp["lambda"] + 1.0 / coeff_qp["mu"]
    else:
        inv = 1.0 / coeff_qp["eta"]
    pscale = -(fes.wq[None, :] * fes.detJ_p) * inv          # (nel, nqp)
    Sel = assemble_schur_pre(fes, coeff_qp, lame=lame)
    dmp = np.zeros(mesh.np_)
    np.add.at(dmp, mesh.p_el_nodes.ravel(),
              np.einsum("eii->ei", Sel).ravel())
    import scipy.sparse as sp
    rows = np.broadcast_to(mesh.p_el_nodes[:, :, None], Sel.shape).ravel()
    cols = np.broadcast_to(mesh.p_el_nodes[:, None, :], Sel.shape).ravel()
    Mp = sp.coo_matrix((Sel.ravel(), (rows, cols)),
                       shape=(mesh.np_, mesh.np_)).tocsr()
    # spectrum of D^-1 Mp (both negative definite -> positive spectrum)
    Dm = sp.diags(1.0 / np.sqrt(np.abs(dmp)))
    Msym = (Dm @ (-Mp) @ Dm).tocsr()
    import scipy.sparse.linalg as spla
    if mesh.np_ <= 600:
        ew = np.linalg.eigvalsh(Msym.toarray())
        p_emin, p_emax = float(ew[0]), float(ew[-1])
    else:
        p_emax = float(spla.eigsh(Msym, k=1, which="LA",
                                  return_eigenvectors=False)[0])
        p_emin = float(spla.eigsh(Msym, k=1, which="SA",
                                  return_eigenvectors=False)[0])

    cast = lambda a: jnp.asarray(np.asarray(a), dtype)
    data = {
        "op": pop,
        "aux": aux,
        "inv_diag_fine": inv_diag_fine,
        "inv_diag_lvls": inv_diag_lvls,
        "stencils": [cast(W) for W in stencils],
        "coarse_inv": cast(coarse_inv),
        "bounds": [(cast(b[0]), cast(b[1])) for b in bounds],
        "pscale": cast(pscale),
        "inv_diag_p": cast((1.0 / dmp).reshape(
            tuple(reversed(mesh.nn_p)))),
        "p_bounds": (cast(p_emin), cast(p_emax)),
    }
    cfg = ABFConfig(ndim=nd, nlevels=nlevels,
                    cls_shapes=tuple(tuple(s) for s in pop.cls_shapes),
                    m_el=tuple(mesh.m_el),
                    level_grids=tuple(lvl_grids),
                    **(cfg_kw or {}))
    setup = {"mesh": mesh, "sop": sop, "rhs_diri": rhs_diri,
             "bc_mask": bc_mask, "x_bc": x_bc, "perm": perm, "iperm": iperm,
             "A00_csr": A00_csr, "coarse_csrs": coarse_csrs, "Mp": Mp}
    return cfg, data, setup


# --------------------------------------------------------------------------
# The composed jitted solver
# --------------------------------------------------------------------------

def make_abf_solver(cfg):
    """Return solve(data, F_tree, x0_tree) -> (x_tree, its, rnorm, state,
    hist), fully traceable. F/x trees are (subs list, p_grid) in the parity
    layout (matfree.to_tree)."""
    nlev = cfg.nlevels
    nd = cfg.ndim

    def solver(data, F, x0):
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _solver_body(data, F, x0)

    def _solver_body(data, F, x0):
        op = data["op"]
        aux = data["aux"]

        # --- level applies (index k: 0 coarsest .. nlev-1 finest) ---------
        def fineA(subs):
            return mult_u_tree(op, aux, subs)

        def lvl1A(xg):
            """Factored Galerkin fine-1 operator: R A_fine P."""
            t = prolong_parity(xg, cfg.cls_shapes, cfg.m_el)
            t = fineA(t)
            return restrict_parity(t, cfg.cls_shapes, cfg.m_el)

        def make_stencilA(W):
            return lambda xg: stencil_apply(W, xg)

        def coarse_solve(xg):
            flat = xg.reshape(-1)
            return (data["coarse_inv"] @ flat).reshape(xg.shape)

        # level operators for k = 1 .. nlev-1 (smoothed levels)
        lvl_ops = {}
        lvl_pc = {}
        lvl_bounds = {}
        for k in range(1, nlev):
            emin, emax = data["bounds"][k - 1]
            lvl_bounds[k] = (emin, emax)
            if k == nlev - 1:
                lvl_ops[k] = fineA
                invd = data["inv_diag_fine"]
                lvl_pc[k] = lambda t, d=invd: [a * b for a, b in zip(d, t)]
            elif k == nlev - 2:
                lvl_ops[k] = lvl1A
                invd = data["inv_diag_lvls"][k - 1]
                lvl_pc[k] = lambda t, d=invd: d * t
            else:
                lvl_ops[k] = make_stencilA(data["stencils"][k - 1])
                invd = data["inv_diag_lvls"][k - 1]
                lvl_pc[k] = lambda t, d=invd: d * t

        def smooth(k, b, x0v):
            emin, emax = lvl_bounds[k]
            return treeops.cheb_smooth(lvl_ops[k], lvl_pc[k], emin, emax,
                                       cfg.cheb_its, b, x0v)

        def restrict_k(k, r):
            """Residual transfer from level k to k-1."""
            if k == nlev - 1:
                return restrict_parity(r, cfg.cls_shapes, cfg.m_el)
            return restrict_grid(r, cfg.level_grids[k - 1])

        def prolong_k(k, xc):
            """Correction transfer from level k-1 to k."""
            if k == nlev - 1:
                return prolong_parity(xc, cfg.cls_shapes, cfg.m_el)
            return prolong_grid(xc, cfg.level_grids[k])

        def vcycle(k, b):
            """PCMG multiplicative V-cycle from zero initial guess
            (precond_mg.PCMG semantics)."""
            if k == 0:
                return coarse_solve(b)
            x = smooth(k, b, treeops.tzeros_like(b))
            r = treeops.tsub(b, lvl_ops[k](x))
            xc = vcycle(k - 1, restrict_k(k, r))
            x = treeops.taxpy(1.0, prolong_k(k, xc), x)
            return smooth(k, b, x)

        def mg_pc(r):
            return vcycle(nlev - 1, r)

        # --- u-block GCR (abf.opts:5-6) -----------------------------------
        gcr = treeops.make_gcr(fineA, mg_pc, restart=cfg.gcr_restart,
                               rtol=cfg.gcr_rtol, max_it=cfg.gcr_max_it)

        # --- Schur p-block: Chebyshev in Jacobi-preconditioned Mpscaled ---
        p_emin, p_emax = data["p_bounds"]
        pscale = data["pscale"]
        inv_dp = data["inv_diag_p"]

        def p_mult(pg):
            return mp_apply(op, pscale, pg)

        def p_pc(pg):
            return inv_dp * pg

        def p_solve(bp):
            return treeops.cheb_smooth(p_mult, p_pc, p_emin, p_emax,
                                       cfg.p_cheb_its, bp,
                                       jnp.zeros_like(bp))

        # --- fieldsplit Schur UPPER (exSaddle.c:313-318) -------------------
        def pc_apply(t):
            bu, bp = t
            yp = p_solve(bp)
            gu = mult_up_tree(op, aux, yp)
            ru = [b - g for b, g in zip(bu, gu)]
            yu, _, _ = gcr(ru)
            return (yu, yp)

        def saddle_mult(t):
            return mult_tree(op, aux, t)

        fgmres = treeops.make_fgmres(saddle_mult, pc_apply,
                                     restart=cfg.restart, rtol=cfg.rtol,
                                     atol=cfg.atol, dtol=cfg.dtol,
                                     max_it=cfg.max_it,
                                     hist_len=cfg.hist_len)
        return fgmres(F, x0)

    return solver


class ABFSolver:
    """Host-facing wrapper: setup + jitted solve + monitor formatting."""

    def __init__(self, mesh, fes, coeff_qp, bc_idx, bc_vals, lame=False,
                 dtype=jnp.float64, nlevels=3, ir=False, **cfg_kw):
        self.mesh = mesh
        self.dtype = dtype
        # Setup (assembly, Galerkin RAP, esteig, dense inverse) is host
        # work: run it on the CPU backend even when an accelerator is the
        # default device -- tiny jnp ops through a TPU tunnel dominate
        # setup time otherwise. The data pytree moves to the default
        # device afterwards.
        cpu = jax.local_devices(backend="cpu")[0]
        accel = jax.devices()[0]
        with jax.default_device(cpu):
            self.cfg, self.data, self.setup = build_abf(
                mesh, fes, coeff_qp, bc_idx, bc_vals, lame=lame,
                dtype=dtype, nlevels=nlevels, cfg_kw=cfg_kw)
            self._ir = None
            if ir:
                # float64 operator for iterative-refinement residuals (the
                # factored data is small: scale_visc + masks, not element
                # matrices)
                op64 = ParityMatFreeOperator.build(
                    mesh, fes, coeff_qp, self.setup["bc_mask"], lame=lame,
                    dtype=jnp.float64)
                aux64 = tree_aux(op64)
        if accel.platform != "cpu":
            self.data = jax.device_put(self.data, accel)
            if ir:
                op64 = jax.device_put(op64, accel)
                aux64 = jax.device_put(aux64, accel)
        self._solve = jax.jit(make_abf_solver(self.cfg))
        if ir:
            @jax.jit
            def resid64(op64, aux64, F64, x64):
                with jax.default_matmul_precision("float32"):
                    r = jax.tree.map(jnp.subtract, F64,
                                     mult_tree(op64, aux64, x64))
                    return r, treeops.tnorm(r)

            self._ir = (op64, aux64, resid64)

    def vec_to_tree(self, x_flat):
        """Natural-ordering (ndof,) vector -> parity tree."""
        xp = np.asarray(x_flat)[self.setup["perm"]]
        return to_tree(self.data["op"], jnp.asarray(xp, self.dtype))

    def tree_to_vec(self, t):
        flat = np.asarray(from_tree(t))
        return flat[self.setup["iperm"]]

    def rhs_tree(self, coeff_qp=None, F_flat=None):
        if F_flat is None:
            raise ValueError("pass F_flat (natural ordering)")
        return self.vec_to_tree(F_flat)

    def solve(self, F_flat, x0_flat=None):
        """Solve A x = F. Returns dict with x (natural ordering), its,
        rnorm, reason, history (list of monitored residuals)."""
        Ft = self.vec_to_tree(F_flat)
        x0 = (self.vec_to_tree(x0_flat) if x0_flat is not None
              else treeops.tzeros_like(Ft))
        x, its, rnorm, state, hist = self._solve(self.data, Ft, x0)
        jax.block_until_ready(x)
        its = int(its)
        hist = np.asarray(hist)
        history = [float(h) for h in hist[: its + 1] if h >= 0.0]
        reason = {treeops.CONVERGED_RTOL: "CONVERGED_RTOL",
                  treeops.CONVERGED_ATOL: "CONVERGED_ATOL",
                  treeops.CONVERGED_HAPPY: "CONVERGED_HAPPY_BREAKDOWN",
                  treeops.DIVERGED_ITS: "DIVERGED_ITS",
                  treeops.DIVERGED_DTOL: "DIVERGED_DTOL"}.get(int(state),
                                                              str(int(state)))
        return {"x": self.tree_to_vec(x), "its": its,
                "rnorm": float(rnorm), "reason": reason,
                "history": history}

    def solve_ir(self, F_flat, rtol=1e-8, max_rounds=10):
        """Mixed-precision iterative refinement: float64 residuals around
        the low-precision jitted ABF solve (requires ir=True at
        construction). The TPU-first route to tight tolerances -- the inner
        FGMRES runs entirely in the working dtype (e.g. float32 on the
        MXU), while the outer correction loop drives the TRUE float64
        residual below rtol * ||r0||.

        Returns dict with x (natural ordering, float64), rounds,
        inner_its (total), rnorm (true float64 residual), history (true
        residual per round)."""
        assert self._ir is not None, "construct with ir=True"
        op64, aux64, resid64 = self._ir
        perm = self.setup["perm"]
        F64 = to_tree(op64, jnp.asarray(np.asarray(F_flat)[perm],
                                        jnp.float64))
        x64 = treeops.tzeros_like(F64)
        r64, rnorm = resid64(op64, aux64, F64, x64)
        rnorm0 = float(rnorm)
        history = [rnorm0]
        inner_total = 0
        cast32 = lambda t: jax.tree.map(
            lambda a: jnp.asarray(a, self.dtype), t)
        stalled = False
        for rounds in range(1, max_rounds + 1):
            rt = cast32(r64)
            dx, its, _, state, _ = self._solve(self.data, rt,
                                               treeops.tzeros_like(rt))
            inner_total += int(its)
            if int(state) < 0:
                # inner solve diverged: a correction built from it would
                # amplify the residual round over round -- stop honestly
                # rather than add garbage (round-2 bench failure mode)
                stalled = True
                break
            x_try = jax.tree.map(
                lambda x, d: x + jnp.asarray(d, jnp.float64), x64, dx)
            r_try, rn_try = resid64(op64, aux64, F64, x_try)
            if float(rn_try) >= float(rnorm):
                stalled = True          # no progress: reject the update
                break
            x64, r64, rnorm = x_try, r_try, rn_try
            history.append(float(rnorm))
            if float(rnorm) <= rtol * rnorm0:
                break
        flat = np.asarray(from_tree(x64))
        return {"x": flat[self.setup["iperm"]], "rounds": rounds,
                "inner_its": inner_total, "rnorm": float(rnorm),
                "rnorm0": rnorm0, "history": history, "stalled": stalled,
                "converged": float(rnorm) <= rtol * rnorm0}
