"""Matrix-free saddle operator: the MXU speed-of-light apply.

On the uniform box meshes the reference uses (DMDASetUniformCoordinates_
Saddle, femixedspace.c:1353-1363) every element has the same isoparametric
geometry, so the element stiffness factors as A11[e] = B^T diag(s_e) B with
a SHARED strain matrix B (nqp*ncomp, nud) and only the per-element viscosity
scale s_e varying. The apply becomes

    strain = Xe @ B^T        # true GEMM on the MXU
    strain *= w_q detJ eta_e # elementwise (VPU)
    Ye     = strain @ B      # GEMM

moving ~nel*nqp floats of coefficient data instead of nel*nud^2 of element
matrices -- two orders of magnitude less HBM traffic than any assembled
SpMV. Gradient/divergence (A12/A21) and the Lame pressure block factor the
same way. Dirichlet elimination is applied as y = keep*A(keep*x)+mask*x,
algebraically identical to the masked element blocks of operator.py.

Element gather/scatter uses the strided-slice grid path (grid_ops.py).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from exsaddle_tpu.grid_ops import (_gather_q2, _scatter_q2, _gather_q1,
                                   _scatter_q1)


def _strain_matrix(G, nd, nbu):
    """Shared strain operator rows.

    G: (nqp, nd, nbu) global basis derivatives (element-independent).
    Returns (B (nqp*ncomp, nd*nbu), wc (ncomp,)) with engineering-strain
    rows: normal strains weight 2, shear strains weight 1 (the 2 eta / 1 eta
    split of MatAssemble_Saddle, femixedspace.c:2530-2560)."""
    nqp = G.shape[0]
    pairs = [(a, b) for a in range(nd) for b in range(a + 1, nd)]
    ncomp = nd + len(pairs)
    B = np.zeros((nqp, ncomp, nd * nbu))
    wc = np.zeros(ncomp)
    for a in range(nd):
        B[:, a, a::nd] = G[:, a, :]
        wc[a] = 2.0
    for r, (a, b) in enumerate(pairs):
        B[:, nd + r, a::nd] = G[:, b, :]
        B[:, nd + r, b::nd] = G[:, a, :]
        wc[nd + r] = 1.0
    return B.reshape(nqp * ncomp, nd * nbu), wc


def factored_host(mesh, fes, coeff_qp, lame=False):
    """Host-side (numpy float64) factored operator data for the uniform
    box mesh: the quantities every matrix-free apply AND the whole ABF
    setup derive from (element matrices are never materialized --
    A11[e] = Bs^T diag(scale[e]) Bs exactly).

    Returns dict with Bs (nqp*ncomp, nud), Dm (nqp, nud), Np (nqp, npb),
    fac (nqp,), scale (nel, nqp*ncomp) FLAT, facp_lam, wc (ncomp,)."""
    nd = mesh.ndim
    G = fes.dNu_glob
    # uniform-geometry check: an O(nel) corner-span test over EVERY
    # element (catches graded meshes globally) plus full-derivative checks
    # on sampled elements (a full allclose over the (nel, nqp, nd, nbu)
    # batch costs seconds at mx=32 for no extra information: interior Q2
    # nodes are midpoints of the corner span by construction here)
    nel = mesh.nel
    xu = mesh.u_el_coords
    span = xu[:, -1] - xu[:, 0]
    smax = np.abs(span[0]).max() + 1e-300
    assert np.abs(span - span[0]).max() <= 1e-12 * smax, \
        "matrix-free path requires uniform element geometry"
    samp = np.unique(np.linspace(0, nel - 1, 8).astype(np.int64))
    gmax = np.abs(G[0]).max()
    for e in samp:
        assert np.abs(G[e] - G[0]).max() <= 1e-12 * gmax, \
            "matrix-free path requires uniform element geometry"
    G0 = np.asarray(G[0])                          # (nqp, nd, nbu)
    detJ0 = float(fes.detJ_u[0, 0])
    Bs, wc = _strain_matrix(G0, nd, mesh.u_basis)
    fac = fes.wq * detJ0                           # (nqp,)
    # Dm[q, nd*i+a] = G0[q, a, i]
    Dm = np.zeros((fes.nqp, nd * mesh.u_basis))
    for a in range(nd):
        Dm[:, a::nd] = G0[:, a, :]

    visc = coeff_qp["mu"] if lame else coeff_qp["eta"]
    scale = (fac[None, :, None] * np.asarray(visc)[:, :, None]
             * wc[None, None, :])                  # (nel, nqp, ncomp)
    scale = np.ascontiguousarray(scale.reshape(nel, -1))

    if lame:
        facp = fes.wq[None, :] * fes.detJ_p
        facp_lam = facp / np.asarray(coeff_qp["lambda"])
    else:
        facp_lam = np.zeros((1, 1))
    return {"Bs": Bs, "Dm": Dm, "Np": np.asarray(fes.Np), "fac": fac,
            "scale": scale, "facp_lam": facp_lam, "wc": wc}


@partial(jax.tree_util.register_dataclass,
         data_fields=["Bs", "Dm", "Np", "scale_visc", "fac", "facp_lam",
                      "keep", "bc_mask"],
         meta_fields=["m_el", "nn_u", "nn_p", "nu", "np_", "ncomp", "nqp"])
@dataclass(frozen=True)
class MatFreeSaddleOperator:
    """Uniform-geometry factored saddle operator (Stokes or Lame)."""
    Bs: jnp.ndarray          # (nqp*ncomp, nud) strain matrix
    Dm: jnp.ndarray          # (nqp, nud) divergence sampling matrix
    Np: jnp.ndarray          # (nqp, npb) Q1 basis at qps
    scale_visc: jnp.ndarray  # (nel, nqp*ncomp) = w detJ * visc * wc, FLAT
    fac: jnp.ndarray         # (nqp,) = w detJ (uniform)
    facp_lam: jnp.ndarray    # (nel, nqp) = w detJp / lambda (Lame) or zeros(1,1)
    keep: jnp.ndarray        # (ndof,) 1 - bc_mask
    bc_mask: jnp.ndarray
    m_el: tuple
    nn_u: tuple
    nn_p: tuple
    nu: int
    np_: int
    ncomp: int
    nqp: int

    @classmethod
    def build(cls, mesh, fes, coeff_qp, bc_mask, lame=False,
              dtype=jnp.float32, host=None):
        """host: optional precomputed factored_host() dict (reused across
        dtypes by the ABF setup)."""
        fd = host if host is not None else factored_host(
            mesh, fes, coeff_qp, lame=lame)
        cast = lambda a: jnp.asarray(np.asarray(a), dtype)
        keep = 1.0 - np.asarray(bc_mask)
        return cls(
            Bs=cast(fd["Bs"]), Dm=cast(fd["Dm"]), Np=cast(fd["Np"]),
            scale_visc=cast(fd["scale"]),
            fac=cast(fd["fac"]), facp_lam=cast(fd["facp_lam"]),
            keep=cast(keep),
            bc_mask=cast(bc_mask), m_el=tuple(mesh.m_el),
            nn_u=tuple(mesh.nn_u), nn_p=tuple(mesh.nn_p),
            nu=mesh.nu, np_=mesh.np_, ncomp=len(fd["wc"]), nqp=fes.nqp)

    @property
    def ndof(self):
        return self.nu + self.np_

    @property
    def lame(self):
        return self.facp_lam.shape[0] > 1

    def mult(self, x):
        nd = len(self.m_el)
        xk = self.keep * x
        xu = xk[: self.nu]
        xp = xk[self.nu:]
        x_grid = xu.reshape(tuple(reversed(self.nn_u)) + (nd,))
        p_grid = xp.reshape(tuple(reversed(self.nn_p)))
        xe = _gather_q2(x_grid, self.m_el)            # (nel, nud)
        pe = _gather_q1(p_grid, self.m_el)            # (nel, npb)
        nel = xe.shape[0]

        # A11: strain -> viscosity scale -> strain^T (scale_visc is stored
        # flat (nel, nqp*ncomp) so no relayout happens between the matmuls)
        strain = (xe @ self.Bs.T) * self.scale_visc
        yue = strain @ self.Bs

        # A12 / A21: divergence coupling, weight -w detJ
        ptmp = pe @ self.Np.T                         # (nel, nqp)
        yue = yue - (ptmp * self.fac[None, :]) @ self.Dm
        div = xe @ self.Dm.T                          # (nel, nqp)
        ype = -(div * self.fac[None, :]) @ self.Np

        if self.lame:                                 # A22 = -1/lambda mass
            ype = ype - (ptmp * self.facp_lam) @ self.Np

        yu = _scatter_q2(yue, self.m_el, self.nn_u, nd).reshape(-1)
        yp = _scatter_q1(ype, self.m_el, self.nn_p).reshape(-1)
        y = jnp.concatenate([yu, yp])
        return self.keep * y + self.bc_mask * x


def assembled_nnz(mesh):
    """Exact nonzero count of the assembled saddle matrix (the cost model
    an explicit SpMV would pay). Tensor-product structure: the neighbor
    count of a grid node is the product of per-dimension 1D neighbor
    counts, so total pairs = product of 1D pair sums."""
    def s_q2q2(m):
        # 1D Q2 grid, 2m+1 nodes: per-node neighbor counts
        tot = 0
        for i in range(2 * m + 1):
            if i % 2 == 0:
                lo = max(i - 2, 0)
                hi = min(i + 2, 2 * m)
            else:
                lo = i - 1
                hi = i + 1
            tot += hi - lo + 1
        return tot

    def s_q2q1(m):
        tot = 0
        for i in range(2 * m + 1):
            e0 = max(i // 2 - (1 if i % 2 == 0 else 0), 0)
            e1 = min(i // 2, m - 1)
            tot += (e1 - e0 + 1) + 1
        return tot

    def s_q1q1(m):
        tot = 0
        for i in range(m + 1):
            tot += min(i + 1, m) - max(i - 1, 0) + 1
        return tot

    d = mesh.ndim
    nnz_uu = d * d * int(np.prod([s_q2q2(m) for m in mesh.m_el]))
    nnz_up = d * int(np.prod([s_q2q1(m) for m in mesh.m_el]))
    nnz_pp = int(np.prod([s_q1q1(m) for m in mesh.m_el]))
    return nnz_uu + 2 * nnz_up + nnz_pp


def coupling_nnz(mesh):
    """Nonzeros of one velocity-pressure coupling block (A10 = A01^T)."""
    def s_q2q1(m):
        tot = 0
        for i in range(2 * m + 1):
            e0 = max(i // 2 - (1 if i % 2 == 0 else 0), 0)
            e1 = min(i // 2, m - 1)
            tot += (e1 - e0 + 1) + 1
        return tot
    return mesh.ndim * int(np.prod([s_q2q1(m) for m in mesh.m_el]))


def allocated_nnz(mesh):
    """The reference's PREALLOCATED nonzero count for the saddle matrix
    (SaddlePreallocation_SEQ, femixedspace.c:181-286): per-row estimates by
    Q2 node parity class using UNCLIPPED interior stencil spans (5 nodes per
    even direction, 3 per odd for velocity; 3/2 for pressure coupling), and
    the full interior span for every pressure row. Reproduces e.g.
    'allocated nonzeros=1585590' for mx=6 3D and 542628 for mx=4 3D
    (testref/exSaddle3d_pseudoice_1.ref, exSaddle3d_ilupack_1.ref)."""
    import itertools
    d = mesh.ndim
    total = 0
    # velocity rows: d dofs per Q2 node
    for parity in itertools.product((0, 1), repeat=d):
        nnodes = 1
        span_u = 1
        span_p = 1
        for m, par in zip(mesh.m_el, parity):
            nnodes *= (m + 1) if par == 0 else m
            span_u *= 5 if par == 0 else 3
            span_p *= 3 if par == 0 else 2
        total += d * nnodes * (d * span_u + span_p)
    # pressure rows: full interior span
    total += mesh.n_p_nodes * (d * 5 ** d + 3 ** d)
    return total


# --------------------------------------------------------------------------
# Parity (even/odd) layout: the fast TPU path.
#
# Stride-2 slicing of the Q2 node grid relayouts vector lanes on TPU and
# dominates the apply cost. Splitting the node grid into 2^nd parity
# subgrids makes every element gather/scatter a unit-stride slice / pad-add.
# Krylov vectors are kept permanently in the parity-permuted dof order
# (dots/axpys are permutation-invariant); conversion happens once per solve.
# --------------------------------------------------------------------------

from jax.lax import optimization_barrier as _ob


def _parity_classes(nn):
    """Per-class node index grids for a structured grid with nn nodes/dim.
    Returns list over class p of int32 arrays of node linear indices with
    shape (*rev(cls_nn)), plus the class shapes."""
    nd = len(nn)
    classes = []
    shapes = []
    for p in range(2 ** nd):
        ax = [np.arange((p >> a) & 1, nn[a], 2) for a in range(nd)]
        if nd == 2:
            jj, ii = np.meshgrid(ax[1], ax[0], indexing="ij")
            lin = ii + jj * nn[0]
        else:
            kk, jj, ii = np.meshgrid(ax[2], ax[1], ax[0], indexing="ij")
            lin = ii + jj * nn[0] + kk * nn[0] * nn[1]
        classes.append(lin.astype(np.int64))
        shapes.append(lin.shape)
    return classes, shapes


def parity_permutation(mesh):
    """Dof permutation: natural order -> [u parity classes | p natural].
    Returns (perm, iperm) with x_parity = x_natural[perm]."""
    nd = mesh.ndim
    classes, _ = _parity_classes(mesh.nn_u)
    u_nodes = np.concatenate([c.ravel() for c in classes])
    u_dofs = (nd * u_nodes[:, None] + np.arange(nd)[None, :]).ravel()
    perm = np.concatenate([u_dofs, mesh.nu + np.arange(mesh.np_)])
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(perm.size)
    return perm, iperm


@partial(jax.tree_util.register_dataclass,
         data_fields=["Bs", "Dm", "Np", "scale_visc", "fac", "facp_lam",
                      "keep", "bc_mask"],
         meta_fields=["m_el", "nn_u", "nn_p", "nu", "np_", "ncomp", "nqp",
                      "cls_shapes"])
@dataclass(frozen=True)
class ParityMatFreeOperator:
    """Matrix-free saddle apply in the parity-permuted dof layout.

    Same factored data as MatFreeSaddleOperator; keep/bc_mask are stored
    permuted. All element traffic is unit-stride."""
    Bs: jnp.ndarray
    Dm: jnp.ndarray
    Np: jnp.ndarray
    scale_visc: jnp.ndarray
    fac: jnp.ndarray
    facp_lam: jnp.ndarray
    keep: jnp.ndarray          # permuted
    bc_mask: jnp.ndarray       # permuted
    m_el: tuple
    nn_u: tuple
    nn_p: tuple
    nu: int
    np_: int
    ncomp: int
    nqp: int
    cls_shapes: tuple          # per parity class, reversed grid shape

    @classmethod
    def build(cls, mesh, fes, coeff_qp, bc_mask, lame=False,
              dtype=jnp.float32, host=None):
        mf = MatFreeSaddleOperator.build(mesh, fes, coeff_qp, bc_mask,
                                         lame=lame, dtype=dtype, host=host)
        return cls.from_matfree(mf, mesh)

    @classmethod
    def from_matfree(cls, mf, mesh):
        """Permute an existing MatFreeSaddleOperator into the parity
        layout (keeps its dtype -- reused by the f64 IR path)."""
        perm, _ = parity_permutation(mesh)
        _, shapes = _parity_classes(mesh.nn_u)
        dtype = mf.Bs.dtype
        cast = lambda a: jnp.asarray(np.asarray(a), dtype)
        keep_p = cast(np.asarray(mf.keep)[perm])
        mask_p = cast(np.asarray(mf.bc_mask)[perm])
        return cls(Bs=mf.Bs, Dm=mf.Dm, Np=mf.Np, scale_visc=mf.scale_visc,
                   fac=mf.fac, facp_lam=mf.facp_lam, keep=keep_p,
                   bc_mask=mask_p, m_el=mf.m_el, nn_u=mf.nn_u,
                   nn_p=mf.nn_p, nu=mf.nu, np_=mf.np_, ncomp=mf.ncomp,
                   nqp=mf.nqp, cls_shapes=tuple(tuple(s) for s in shapes))

    @property
    def ndof(self):
        return self.nu + self.np_

    @property
    def lame(self):
        return self.facp_lam.shape[0] > 1

    def _split_u(self, xu):
        """Permuted u vector -> list of per-class grids (*cls_shape, d)."""
        return split_u_parity(xu, self.cls_shapes, len(self.m_el))

    def _gather_u(self, subs):
        return gather_u_parity(subs, self.m_el)

    def _scatter_u(self, ye):
        return scatter_u_parity(ye, self.m_el, self.cls_shapes)

    def mult(self, x):
        """y = A x, both in the parity-permuted layout."""
        nd = len(self.m_el)
        xk = self.keep * x
        xu = xk[: self.nu]
        xp = xk[self.nu:]
        subs = self._split_u(xu)
        p_grid = xp.reshape(tuple(reversed(self.nn_p)))

        xe = _ob(self._gather_u(subs))
        pe = _ob(_gather_q1(p_grid, self.m_el))
        nel = xe.shape[0]

        strain = _ob(xe @ self.Bs.T) * self.scale_visc
        yue = _ob(strain @ self.Bs)
        ptmp = _ob(pe @ self.Np.T)
        yue = yue - _ob((ptmp * self.fac[None, :]) @ self.Dm)
        div = _ob(xe @ self.Dm.T)
        ype = -(div * self.fac[None, :]) @ self.Np
        if self.lame:
            ype = ype - (ptmp * self.facp_lam) @ self.Np
        ype = _ob(ype)

        outs = self._scatter_u(yue)
        yu = jnp.concatenate([o.reshape(-1) for o in outs])
        yp = _scatter_q1(ype, self.m_el, self.nn_p).reshape(-1)
        y = jnp.concatenate([yu, yp])
        return self.keep * y + self.bc_mask * x


# --- parity-layout element data movement (free functions: the same code
# serves the global operator and per-shard local slabs in parallel/) -------

def split_u_parity(xu, cls_shapes, nd):
    """Permuted flat u vector -> list of per-class grids (*cls_shape, d)."""
    subs = []
    off = 0
    for s in cls_shapes:
        n = int(np.prod(s))
        subs.append(xu[off * nd:(off + n) * nd].reshape(tuple(s) + (nd,)))
        off += n
    return subs


def gather_u_parity(subs, m_el):
    """Parity subgrids -> (nel, 3^nd * nd) element dof values; every slice
    unit-stride."""
    nd = len(m_el)
    m = m_el
    slabs = []
    if nd == 2:
        for lb in range(3):
            for la in range(3):
                p = (la & 1) | ((lb & 1) << 1)
                sa, sb = la >> 1, lb >> 1
                slabs.append(subs[p][sb:sb + m[1], sa:sa + m[0], :])
        xe = jnp.stack(slabs, axis=2)
        return xe.reshape(m[0] * m[1], 9 * nd)
    for lc in range(3):
        for lb in range(3):
            for la in range(3):
                p = (la & 1) | ((lb & 1) << 1) | ((lc & 1) << 2)
                sa, sb, sc = la >> 1, lb >> 1, lc >> 1
                slabs.append(subs[p][sc:sc + m[2], sb:sb + m[1],
                                     sa:sa + m[0], :])
    xe = jnp.stack(slabs, axis=3)
    return xe.reshape(int(np.prod(m)), 27 * nd)


def scatter_u_parity(ye, m_el, cls_shapes):
    """Transpose of gather_u_parity: element contributions -> parity
    subgrids via pad-adds (conflict-free per local offset)."""
    nd = len(m_el)
    m = m_el
    zero = jnp.array(0.0, ye.dtype)
    out = [jnp.zeros(tuple(s) + (nd,), ye.dtype) for s in cls_shapes]
    if nd == 2:
        yel = ye.reshape(m[1], m[0], 9, nd)
        for lb in range(3):
            for la in range(3):
                p = (la & 1) | ((lb & 1) << 1)
                sa, sb = la >> 1, lb >> 1
                c = yel[:, :, la + 3 * lb, :]
                pads = [(sb, cls_shapes[p][0] - sb - m[1], 0),
                        (sa, cls_shapes[p][1] - sa - m[0], 0),
                        (0, 0, 0)]
                out[p] = out[p] + lax.pad(c, zero, pads)
        return out
    yel = ye.reshape(m[2], m[1], m[0], 27, nd)
    for lc in range(3):
        for lb in range(3):
            for la in range(3):
                p = (la & 1) | ((lb & 1) << 1) | ((lc & 1) << 2)
                sa, sb, sc = la >> 1, lb >> 1, lc >> 1
                c = yel[:, :, :, la + 3 * lb + 9 * lc, :]
                pads = [(sc, cls_shapes[p][0] - sc - m[2], 0),
                        (sb, cls_shapes[p][1] - sb - m[1], 0),
                        (sa, cls_shapes[p][2] - sa - m[0], 0),
                        (0, 0, 0)]
                out[p] = out[p] + lax.pad(c, zero, pads)
    return out


# --------------------------------------------------------------------------
# Tree-form apply: the fastest path. Flat (ndof,) vectors pay repeated
# 1-D <-> grid relayouts inside jitted loops (measured ~9x slower at mx=32);
# keeping Krylov vectors as a pytree of parity subgrids + the Q1 grid
# eliminates every concat/split/slice from the iteration.
# --------------------------------------------------------------------------

def tree_aux(op):
    """Per-class keep/mask grids for the tree-form apply. Pass alongside
    the operator as jit ARGUMENTS (closure constants re-upload per call on
    tunneled TPU backends)."""
    ks = op._split_u(op.keep[: op.nu])
    ms = op._split_u(op.bc_mask[: op.nu])
    kp = op.keep[op.nu:].reshape(tuple(reversed(op.nn_p)))
    mp = op.bc_mask[op.nu:].reshape(tuple(reversed(op.nn_p)))
    return (ks, ms, kp, mp)


def to_tree(op, x):
    """Flat parity-layout vector -> (subs list, p_grid)."""
    return (op._split_u(x[: op.nu]),
            x[op.nu:].reshape(tuple(reversed(op.nn_p))))


def from_tree(tree):
    subs, pg = tree
    return jnp.concatenate([s.reshape(-1) for s in subs] + [pg.reshape(-1)])


def tree_dot(a, b):
    return (sum(jnp.sum(s * t) for s, t in zip(a[0], b[0]))
            + jnp.sum(a[1] * b[1]))


def tree_norm(a):
    return jnp.sqrt(tree_dot(a, a))


def mult_tree(op, aux, tree, halo_u=None, halo_p=None):
    """y = A x in tree form. op: ParityMatFreeOperator; aux: tree_aux(op);
    tree: (subs, p_grid). Returns the same structure. halo_u/halo_p:
    optional post-scatter interface exchanges for distributed slab layouts
    (parallel/dist_abf.py); None on a single shard."""
    ks, ms, kp, mp = aux
    subs, pg = tree
    nel = int(np.prod(op.m_el))
    xe = _ob(op._gather_u([s * k for s, k in zip(subs, ks)]))
    pe = _ob(_gather_q1(pg * kp, op.m_el))
    strain = _ob(xe @ op.Bs.T) * op.scale_visc
    yue = _ob(strain @ op.Bs)
    ptmp = _ob(pe @ op.Np.T)
    yue = yue - _ob((ptmp * op.fac[None, :]) @ op.Dm)
    div = _ob(xe @ op.Dm.T)
    ype = -(div * op.fac[None, :]) @ op.Np
    if op.lame:
        ype = ype - (ptmp * op.facp_lam) @ op.Np
    ype = _ob(ype)
    outs = op._scatter_u(yue)
    yp = _scatter_q1(ype, op.m_el, op.nn_p)
    if halo_u is not None:
        outs = halo_u(outs)
    if halo_p is not None:
        yp = halo_p(yp)
    outs = [o * k + m * s for o, k, m, s in zip(outs, ks, ms, subs)]
    return (outs, yp * kp + mp * pg)
