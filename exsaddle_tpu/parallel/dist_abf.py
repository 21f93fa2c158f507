"""Distributed fully-jitted ABF solve: slab domain decomposition over a
device mesh, shard_map + explicit ICI collectives.

The flagship solver (exsaddle_tpu/abf.py) re-run as ONE shard_map program
over a 1D device axis "z" slicing the slowest grid axis into element-aligned
slabs (the reference's DMDA macro-element ownership rule,
femixedspace.c:1102-1124):

  - interface node planes are stored REDUNDANTLY on both neighbors (the
    DMDA ghosted-local pattern); element gathers need no communication;
  - after every element scatter, interface-plane partial sums are exchanged
    and added with `lax.ppermute` (DMLocalToGlobal ADD_VALUES);
  - dots/norms weight duplicated planes to zero and reduce with `lax.psum`
    (the MPI_Allreduce of every VecDot/VecNorm, SURVEY.md section 3.2);
  - MG: the fine level and the first Galerkin coarse level smooth on
    sharded slabs; levels below that (and the dense coarse inverse) are
    REPLICATED on every device -- the PCREDUNDANT pattern (Makefile:276) --
    via ownership-masked psum gathers;
  - the outer FGMRES / inner GCR run with psum-reduced Gram-Schmidt via
    treeops.make_dots, everything inside one lax.while_loop program.

Memory and compute for the fine/L-2 levels scale with 1/ndev; the
replicated coarse work is O(coarse grid) per device.

Setup note (VERDICT r3 item 9): the slab build reuses the batch-free
global setup (abf.build_abf) and slices device slabs from its factored
arrays. Since round 4 that setup never materializes an element-matrix
batch anywhere -- the heaviest global transient is the O(nel * nqp *
ncomp) coefficient scale, the same asymptotic class as the per-shard
cartesian path's own global accumulations (diag_u, eta_g). The cartesian
solver (parallel/cart_abf.py) remains the production N-D path with
per-box assembly and multi-host partial reduction; the slab path is kept
as the simpler 1-D special case and the dryrun's first target.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exsaddle_tpu import treeops
from exsaddle_tpu import abf as _abf
from exsaddle_tpu.abf import (ABFConfig, build_abf, prolong_parity,
                              restrict_parity, prolong_grid, restrict_grid,
                              stencil_apply, mult_u_tree, mult_up_tree,
                              mult_pu_tree, mp_apply)
from exsaddle_tpu.matfree import (ParityMatFreeOperator, mult_tree,
                                  to_tree, from_tree)

AXIS = "z"


@dataclass(frozen=True)
class DistABFConfig:
    base: ABFConfig            # GLOBAL grid metadata + solver knobs
    ndev: int
    mloc: int                  # elements per device along the slab axis
    m_el_loc: tuple
    cls_shapes_loc: tuple      # local parity class shapes
    nn_p_loc: tuple            # local Q1 node counts (per axis, x first)
    lvl1_loc_shape: tuple      # local L-2 grid spatial shape (reversed)


def _zslab(arr, z0, z1):
    """Slice planes [z0, z1) along array dim 0."""
    return arr[z0:z1]


def build_dist_abf(mesh, fes, coeff_qp, bc_idx, bc_vals, ndev, lame=False,
                   dtype=jnp.float64, nlevels=3, cfg_kw=None):
    """Global setup (build_abf) + slab sharding of the data pytree.

    Returns (dcfg, ddata, setup). ddata leaves that scale with the problem
    carry a leading device axis (shard with NamedSharding(mesh, P('z')));
    replicated leaves don't."""
    m_last = mesh.m_el[-1]
    if m_last % ndev:
        raise ValueError(
            f"element count {m_last} along the slab axis is not divisible "
            f"by {ndev} devices (macro-element alignment, "
            "femixedspace.c:1102-1124)")
    cfg, data, setup = build_abf(mesh, fes, coeff_qp, bc_idx, bc_vals,
                                 lame=lame, dtype=dtype, nlevels=nlevels,
                                 cfg_kw=cfg_kw)
    op = data["op"]
    nd = mesh.ndim
    mloc = m_last // ndev
    nelxy = int(np.prod(mesh.m_el[:-1]))

    def stack_el(a):
        """(nel, ...) -> (ndev, mloc*nelxy, ...): element slabs (elements
        are x-fastest, slab axis slowest)."""
        a = np.asarray(a)
        return a.reshape((ndev, mloc * nelxy) + a.shape[1:])

    def stack_cls(grids):
        """Per-class node grids -> per-class (ndev, loc_z, ...) slabs.
        bz=0 classes share their boundary plane (mloc+1 planes/dev)."""
        out = []
        for p, g in enumerate(grids):
            g = np.asarray(g)
            bz = (p >> (nd - 1)) & 1
            cnt = mloc + 1 - bz
            out.append(np.stack([g[d * mloc: d * mloc + cnt]
                                 for d in range(ndev)]))
        return out

    def stack_grid(g):
        """(z, ...) node grid with mz+1 planes -> (ndev, mloc+1, ...)."""
        g = np.asarray(g)
        return np.stack([g[d * mloc: d * mloc + mloc + 1]
                         for d in range(ndev)])

    ks, ms, kp, mp = data["aux"]
    ddata = {
        "scale_visc": stack_el(op.scale_visc),
        "pscale": stack_el(data["pscale"]),
        "ks": stack_cls(ks), "ms": stack_cls(ms),
        "kp": stack_grid(kp), "mp": stack_grid(mp),
        "inv_diag_fine": stack_cls(data["inv_diag_fine"]),
        "inv_diag_l1": stack_grid(data["inv_diag_lvls"][-1]),
        "inv_diag_p": stack_grid(data["inv_diag_p"]),
        # sharded L-2 Galerkin block stencil (stencils[-1] is the L-2
        # level): mloc+1 planes per device, interface plane redundant
        "W1": stack_grid(setup["stencils_w"][-1]),
        # Lame A22 weights are per-element (sharded); Stokes carries the
        # (1, 1) zero sentinel per device
        "facp_lam": (stack_el(op.facp_lam) if lame
                     else np.zeros((ndev, 1, 1))),
        # replicated
        "Bs": op.Bs, "Dm": op.Dm, "Np": op.Np, "fac": op.fac,
        "coarse_inv": data["coarse_inv"],
        "stencils": setup["stencils_w"][:-1],
        "inv_diag_repl": data["inv_diag_lvls"][:-1],
        "bounds": data["bounds"],
        "p_bounds": data["p_bounds"],
    }
    cast = lambda a: jnp.asarray(np.asarray(a), dtype)
    ddata = jax.tree.map(cast, ddata)

    cls_loc = []
    for p, s in enumerate(cfg.cls_shapes):
        bz = (p >> (nd - 1)) & 1
        cls_loc.append((mloc + 1 - bz,) + tuple(s[1:]))
    m_el_loc = tuple(mesh.m_el[:-1]) + (mloc,)
    nn_p_loc = tuple(mesh.nn_p[:-1]) + (mloc + 1,)
    lvl1_glob = cfg.level_grids[-2]
    lvl1_loc = (mloc + 1,) + tuple(lvl1_glob[1:])
    dcfg = DistABFConfig(base=cfg, ndev=ndev, mloc=mloc,
                         m_el_loc=m_el_loc,
                         cls_shapes_loc=tuple(cls_loc),
                         nn_p_loc=nn_p_loc, lvl1_loc_shape=lvl1_loc)
    return dcfg, ddata, setup


# --- per-shard communication primitives -------------------------------------

def _halo_add(grid):
    """Exchange-and-add interface-plane partial sums with both neighbors
    along dim 0 (redundant-plane slab layout)."""
    ndev = lax.axis_size(AXIS)
    if ndev == 1:
        return grid
    up = [(i, i + 1) for i in range(ndev - 1)]
    dn = [(i + 1, i) for i in range(ndev - 1)]
    from_left = lax.ppermute(grid[-1], AXIS, up)
    from_right = lax.ppermute(grid[0], AXIS, dn)
    grid = grid.at[0].add(from_left)
    return grid.at[-1].add(from_right)


def _own_w(nzl, ndim_tail, dtype):
    """Ownership weight along dim 0: plane 0 weighs 0 on devices > 0 (it
    duplicates the left neighbor's top plane)."""
    d = lax.axis_index(AXIS)
    w = jnp.where((jnp.arange(nzl) == 0) & (d > 0),
                  jnp.zeros((), dtype), jnp.ones((nzl,), dtype))
    return w.reshape((nzl,) + (1,) * ndim_tail)


def make_dist_abf_solver(dcfg):
    """solve(ddata, F, x0) -> (x, its, rnorm, state, hist): the whole ABF
    solve as one shard_map program over the AXIS device axis. F/x0 are
    slab-stacked saddle trees (subs list + p grid, leading device axis)."""
    cfg = dcfg.base
    # zero-guess pre-smooths skip the initial A x0 apply (bit-identical)
    # and may run fewer iterations than the post-smooth (abf.ABFConfig
    # cheb_pre_its; 0 = symmetric)
    pre_its = cfg.cheb_pre_its if cfg.cheb_pre_its > 0 else cfg.cheb_its
    nd = cfg.ndim
    nlev = cfg.nlevels
    m_el_loc = dcfg.m_el_loc
    cls_loc = dcfg.cls_shapes_loc
    nn_p_loc = dcfg.nn_p_loc
    mloc = dcfg.mloc
    lvl1_glob = cfg.level_grids[-2]
    shared_bit = nd - 1

    ncomp = nd + nd * (nd - 1) // 2
    nqp = 3 ** nd

    def local_solver(dd, F, x0):
        dtype = dd["Bs"].dtype
        # local operator view: global factored constants + local slab data
        op = ParityMatFreeOperator(
            Bs=dd["Bs"], Dm=dd["Dm"], Np=dd["Np"],
            scale_visc=dd["scale_visc"], fac=dd["fac"],
            facp_lam=dd["facp_lam"], keep=jnp.zeros((0,), dtype),
            bc_mask=jnp.zeros((0,), dtype), m_el=m_el_loc,
            nn_u=tuple(2 * m + 1 for m in m_el_loc), nn_p=nn_p_loc,
            nu=0, np_=0, ncomp=ncomp,
            nqp=nqp, cls_shapes=cls_loc)
        aux = (dd["ks"], dd["ms"], dd["kp"], dd["mp"])

        def halo_u(subs):
            return [_halo_add(s) if ((p >> shared_bit) & 1) == 0 else s
                    for p, s in enumerate(subs)]

        def halo_p(g):
            return _halo_add(g)

        # ownership weights for dots / restrictions
        w_subs = [(_own_w(s.shape[0], s.ndim - 1, dtype)
                   if ((p >> shared_bit) & 1) == 0 else
                   jnp.ones((1,) * s.ndim, dtype))
                  for p, s in enumerate(dd["ks"])]
        w_p = _own_w(dd["kp"].shape[0], dd["kp"].ndim - 1, dtype)
        dots_u = treeops.make_dots(weight=w_subs, psum_axis=AXIS)
        dots_sad = treeops.make_dots(weight=(w_subs, w_p), psum_axis=AXIS)

        def fineA(subs):
            return mult_u_tree(op, aux, subs, halo_u=halo_u)

        # L-2 Galerkin level: sharded block stencil with one ppermute
        # ghost plane along the slab axis (replaces the factored
        # R A_fine P apply -- a full fine-grid apply per smoothing
        # iteration, VERDICT r3 weak #3)
        W1 = dd["W1"]
        zero_pads = [(1, 1, 0)] * (nd - 1) + [(0, 0, 0)]

        def lvl1A(xg):
            from exsaddle_tpu.parallel.cart import ghost_extend_axis
            xp = ghost_extend_axis(xg, AXIS, 0)
            xp = lax.pad(xp, jnp.zeros((), xp.dtype),
                         [(0, 0, 0)] + zero_pads)
            return _abf.stencil_accum(W1, xp)

        # replicated full L-2 grid <-> local slab
        w_l1 = _own_w(mloc + 1, len(lvl1_glob), dtype)

        def _idx0():
            d = lax.axis_index(AXIS)
            return ((d * mloc).astype(jnp.int32),) + tuple(
                jnp.int32(0) for _ in range(len(lvl1_glob)))

        def l1_to_replicated(slab):
            full = jnp.zeros(tuple(lvl1_glob) + (nd,), dtype)
            full = lax.dynamic_update_slice(full, w_l1 * slab, _idx0())
            return lax.psum(full, AXIS)

        def l1_from_replicated(full):
            return lax.dynamic_slice(full, _idx0(),
                                     dcfg.lvl1_loc_shape + (nd,))

        # replicated deep levels (k <= nlev-3): plain grids, stencil ops
        def coarse_solve(xg):
            flat = xg.reshape(-1)
            return (dd["coarse_inv"] @ flat).reshape(xg.shape)

        def repl_ops(k):
            if k == 0:
                return None
            W = dd["stencils"][k - 1]
            return lambda xg: stencil_apply(W, xg)

        def repl_vcycle(k, b):
            """Replicated V-cycle below the sharded levels (identical on
            every device -- PCREDUNDANT)."""
            if k == 0:
                return coarse_solve(b)
            A = repl_ops(k)
            emin, emax = dd["bounds"][k - 1]
            invd = dd["inv_diag_repl"][k - 1]
            pc = lambda t: invd * t
            x = treeops.cheb_smooth(A, pc, emin, emax, pre_its, b,
                                    jnp.zeros_like(b), x0_zero=True)
            r = b - A(x)
            xc = repl_vcycle(k - 1, restrict_grid(r, cfg.level_grids[k - 1]))
            x = x + prolong_grid(xc, cfg.level_grids[k])
            return treeops.cheb_smooth(A, pc, emin, emax, cfg.cheb_its, b, x)

        # sharded L-2 level
        emin1, emax1 = dd["bounds"][nlev - 2 - 1]
        invd1 = dd["inv_diag_l1"]
        pc1 = lambda t: invd1 * t

        def smooth_l1(b, x0v, pre=False):
            return treeops.cheb_smooth(lvl1A, pc1, emin1, emax1,
                                       pre_its if pre else cfg.cheb_its,
                                       b, x0v, x0_zero=pre)

        def vcycle_l1(b):
            x = smooth_l1(b, jnp.zeros_like(b), pre=True)
            r = b - lvl1A(x)
            if nlev == 3:
                r_rep = restrict_grid(l1_to_replicated(r),
                                      cfg.level_grids[0])
                xc_rep = coarse_solve(r_rep)
                xc = l1_from_replicated(
                    prolong_grid(xc_rep, cfg.level_grids[1]))
            else:
                r_rep = restrict_grid(l1_to_replicated(r),
                                      cfg.level_grids[nlev - 3])
                xc_rep = repl_vcycle(nlev - 3, r_rep)
                xc = l1_from_replicated(
                    prolong_grid(xc_rep, cfg.level_grids[nlev - 2]))
            x = x + xc
            return smooth_l1(b, x)

        # fine level
        eminf, emaxf = dd["bounds"][-1]
        invdf = dd["inv_diag_fine"]
        pcf = lambda t: [a * b for a, b in zip(invdf, t)]

        def smooth_fine(b, x0v, pre=False):
            return treeops.cheb_smooth(fineA, pcf, eminf, emaxf,
                                       pre_its if pre else cfg.cheb_its,
                                       b, x0v, x0_zero=pre)

        def mg_pc(r):
            x = smooth_fine(r, treeops.tzeros_like(r), pre=True)
            rr = treeops.tsub(r, fineA(x))
            r1 = _halo_add(restrict_parity(
                [w * s for w, s in zip(w_subs, rr)], cls_loc, m_el_loc))
            x1 = vcycle_l1(r1)
            x = treeops.taxpy(1.0, prolong_parity(x1, cls_loc, m_el_loc), x)
            return smooth_fine(r, x)

        gcr = treeops.make_gcr(fineA, mg_pc, restart=cfg.gcr_restart,
                               rtol=cfg.gcr_rtol, max_it=cfg.gcr_max_it,
                               dots=dots_u)

        # Schur p-block
        p_emin, p_emax = dd["p_bounds"]
        inv_dp = dd["inv_diag_p"]

        def p_mult(pg):
            return mp_apply(op, dd["pscale"], pg, halo_p=halo_p)

        def p_solve(bp):
            return treeops.cheb_smooth(p_mult, lambda g: inv_dp * g,
                                       p_emin, p_emax, cfg.p_cheb_its, bp,
                                       jnp.zeros_like(bp), x0_zero=True)

        def pc_apply(t):
            bu, bp = t
            yp = p_solve(bp)
            gu = mult_up_tree(op, aux, yp, halo_u=halo_u)
            ru = [b - g for b, g in zip(bu, gu)]
            yu, _, _ = gcr(ru)
            return (yu, yp)

        def saddle_mult(t):
            return mult_tree(op, aux, t, halo_u=halo_u, halo_p=halo_p)

        fgmres = treeops.make_fgmres(saddle_mult, pc_apply,
                                     restart=cfg.restart, rtol=cfg.rtol,
                                     atol=cfg.atol, dtol=cfg.dtol,
                                     max_it=cfg.max_it,
                                     hist_len=cfg.hist_len, dots=dots_sad)
        return fgmres(F, x0)

    return local_solver


def _squeeze(t):
    return jax.tree.map(lambda a: a[0], t)


def _unsqueeze(t):
    return jax.tree.map(lambda a: a[None], t)


class DistABFSolver:
    """Host-facing distributed ABF: setup + shard_map-jitted solve."""

    # ddata keys that carry a leading device axis
    _SHARDED = {"scale_visc", "pscale", "facp_lam", "ks", "ms", "kp", "mp",
                "inv_diag_fine", "inv_diag_l1", "inv_diag_p", "W1"}

    def __init__(self, mesh, fes, coeff_qp, bc_idx, bc_vals, devices,
                 lame=False, dtype=jnp.float64, nlevels=3, **cfg_kw):
        self.mesh = mesh
        self.dtype = dtype
        ndev = len(devices)
        self.ndev = ndev
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            self.dcfg, ddata, self.setup = build_dist_abf(
                mesh, fes, coeff_qp, bc_idx, bc_vals, ndev, lame=lame,
                dtype=dtype, nlevels=nlevels, cfg_kw=cfg_kw)
        self.dmesh = Mesh(np.array(devices), (AXIS,))
        shard = NamedSharding(self.dmesh, P(AXIS))
        repl = NamedSharding(self.dmesh, P())
        self.ddata = {k: jax.device_put(v, shard if k in self._SHARDED
                                        else repl)
                      for k, v in ddata.items()}

        local = make_dist_abf_solver(self.dcfg)
        vspec = jax.tree.map(lambda _: P(AXIS),
                             self._vec_struct(), is_leaf=lambda x: x is None)
        dspec = {k: (jax.tree.map(lambda _: P(AXIS), ddata[k])
                     if k in self._SHARDED
                     else jax.tree.map(lambda _: P(), ddata[k]))
                 for k in ddata}

        from jax import shard_map

        def wrapped(dd, F, x0):
            dd_l = {k: (_squeeze(v) if k in self._SHARDED else v)
                    for k, v in dd.items()}
            x, its, rnorm, state, hist = local(
                dd_l, _squeeze(F), _squeeze(x0))
            return (_unsqueeze(x), its, rnorm, state, hist)

        # check_vma=True: treeops zero-initializers derive their variance
        # from the reference vector, so loop carries typecheck under
        # shard_map's replication checking (VERDICT r2 item 10)
        self._solve = jax.jit(shard_map(
            wrapped, mesh=self.dmesh,
            in_specs=(dspec, vspec, vspec),
            out_specs=(vspec, P(), P(), P(), P()), check_vma=True))

    # --- vector conversions ------------------------------------------------
    def _vec_struct(self):
        nd = self.mesh.ndim
        return ([None] * (2 ** nd), None)

    def shard_tree(self, t):
        """Global parity tree -> slab-stacked tree (numpy host path)."""
        subs, pg = t
        nd = self.mesh.ndim
        mloc = self.dcfg.mloc
        out_subs = []
        for p, g in enumerate(subs):
            g = np.asarray(g)
            bz = (p >> (nd - 1)) & 1
            cnt = mloc + 1 - bz
            out_subs.append(np.stack([g[d * mloc: d * mloc + cnt]
                                      for d in range(self.ndev)]))
        pg = np.asarray(pg)
        out_p = np.stack([pg[d * mloc: d * mloc + mloc + 1]
                          for d in range(self.ndev)])
        shard = NamedSharding(self.dmesh, P(AXIS))
        cast = lambda a: jax.device_put(jnp.asarray(a, self.dtype), shard)
        return ([cast(s) for s in out_subs], cast(out_p))

    def unshard_tree(self, t):
        """Slab-stacked tree -> global parity tree (host numpy)."""
        subs, pg = t
        nd = self.mesh.ndim
        mloc = self.dcfg.mloc
        gsubs = []
        for p, s in enumerate(subs):
            s = np.asarray(s)
            bz = (p >> (nd - 1)) & 1
            glob_z = self.mesh.m_el[-1] + 1 - bz
            g = np.zeros((glob_z,) + s.shape[2:], s.dtype)
            for d in range(self.ndev):
                g[d * mloc: d * mloc + s.shape[1]] = s[d]
            gsubs.append(g)
        pg = np.asarray(pg)
        gp = np.zeros((self.mesh.m_el[-1] + 1,) + pg.shape[2:], pg.dtype)
        for d in range(self.ndev):
            gp[d * mloc: d * mloc + pg.shape[1]] = pg[d]
        return (gsubs, gp)

    def solve(self, F_flat, x0_flat=None):
        """Solve A x = F (natural-ordering flat vectors on the host)."""
        perm = self.setup["perm"]
        Fp = np.asarray(F_flat)[perm]
        nd = self.mesh.ndim
        cls_shapes = self.dcfg.base.cls_shapes
        from exsaddle_tpu.matfree import split_u_parity
        nu = self.mesh.nu
        subs = split_u_parity(jnp.asarray(Fp[:nu], self.dtype),
                              cls_shapes, nd)
        pgrid = jnp.asarray(
            Fp[nu:].reshape(tuple(reversed(self.mesh.nn_p))), self.dtype)
        Ft = self.shard_tree((subs, pgrid))
        x0 = jax.tree.map(jnp.zeros_like, Ft)
        x, its, rnorm, state, hist = self._solve(self.ddata, Ft, x0)
        jax.block_until_ready(x)
        xg = self.unshard_tree(x)
        flat = np.concatenate([g.reshape(-1) for g in xg[0]]
                              + [xg[1].reshape(-1)])
        iperm = self.setup["iperm"]
        its = int(its)
        hist = np.asarray(hist)
        return {"x": flat[iperm], "its": its, "rnorm": float(rnorm),
                "state": int(state),
                "history": [float(h) for h in hist[: its + 1] if h >= 0.0]}
