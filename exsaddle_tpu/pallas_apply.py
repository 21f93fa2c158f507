"""Pallas-fused velocity-block apply (3D): a documented NEGATIVE result.

Hypothesis: the XLA apply (matfree.mult_tree) materializes the element
gather xe (nel, 81), the strain intermediate (nel, 162) and the element
result yue in HBM -- tens of MB of round trips per apply at mx=32 -- so a
kernel fusing gather -> GEMM -> viscosity scale -> GEMM -> scatter over
one z-plane of elements per grid step, with every intermediate in VMEM,
should approach the ~105 us roofline (bench.py extras) instead of the
XLA apply's ~370-600 us.

Measured outcome on the v5e (mx=32, correctness verified to f32
summation order against the XLA path): the fused kernel runs ~1.48 ms
per apply vs ~0.6-0.8 ms for XLA -- ~2x SLOWER. Root cause: the parity
grids' trailing dof dim is 3, so every (1, ydim, xdim, 3) block tiles to
(.., 40, 128) in Mosaic's (8, 128) vector layout -- a 42x lane padding
-- and XLA additionally relays the HBM operands into that padded tiled
layout at every call; the memory pipeline moves padded bytes, swamping
the saved intermediates. Beating XLA here requires a merged
(z, y, x*nd)-lane native vector layout end to end, but the in-kernel
unmerge/stack ops that gather then needs ((27, 3) -> 81 lane merges,
lane-dim stacks) are exactly the relayouting reshapes Mosaic cannot
lower (verified: 'tpu.reshape ... not implemented', 'tpu.concatenate
... offset mismatch on non-concat dimension').

The kernel is kept as working, tested documentation of that boundary
(tests/test_fast_apply.py exercises it on TPU only); the production
apply stays the XLA path, which the bench's roofline block shows is
within ~2x of a fused ideal once the mandatory 6-pass f32 matmul
precision is accounted for.

Implementation notes that made it compile at all (useful for future
kernels on this backend):
  - classes with even z-parity are passed TWICE (their ez and ez+1 node
    planes) so all block specs use plain Blocked indexing;
  - outputs are split into disjoint per-step lo/hi buffers combined by a
    cheap XLA pad-add -- grid steps never revisit an output block;
  - index-map constants must be numpy int32 under jax_enable_x64 (i64
    constants fail Mosaic legalization; jnp arrays may not be captured);
  - lax.pad inside the kernel lowers to unsupported concats on these
    shapes -- scatter uses grouped ref-slice accumulation instead;
  - the default 16M scoped-vmem budget needs raising via
    CompilerParams(vmem_limit_bytes=...) for the padded blocks.

Reference for WHAT is computed: femixedspace.c:2373-2647 (A11 weak form)
in the factored uniform-geometry form of matfree.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _cls_bits(p):
    return (p & 1, (p >> 1) & 1, (p >> 2) & 1)      # (bx, by, bz)


def make_pallas_mult_u(op):
    """Fused velocity-block apply y_subs = A11_raw x_subs (no BC masks --
    callers mask inputs/outputs exactly like mult_u_tree does).

    op: ParityMatFreeOperator (3D). Returns mult(subs) -> subs."""
    assert len(op.m_el) == 3, "pallas apply is 3D"
    mx, my, mz = op.m_el
    nd = 3
    nbu = 27
    nel_plane = mx * my
    nqpc = op.Bs.shape[0]
    cls_shapes = [tuple(s) for s in op.cls_shapes]   # reversed (z, y, x)

    # ---- block specs ------------------------------------------------------
    # index-map constants MUST be i32: under jax_enable_x64 python-int
    # constants trace as i64 and Mosaic fails to legalize the map function
    # (numpy scalar, not a jnp Array -- index maps may not capture arrays)
    z0 = np.int32(0)

    def _m4(i):
        return (i, z0, z0, z0)

    def _m4p1(i):
        return (i + 1, z0, z0, z0)

    in_specs = []
    in_meta = []          # (class p, sc) per parity input ref
    for p in range(8):
        bx, by, bz = _cls_bits(p)
        zdim, ydim, xdim = cls_shapes[p]
        blk = (1, ydim, xdim, nd)
        if bz == 0:
            # even-z: ez plane and ez+1 plane as two refs
            in_specs.append(pl.BlockSpec(blk, _m4))
            in_meta.append((p, 0))
            in_specs.append(pl.BlockSpec(blk, _m4p1))
            in_meta.append((p, 1))
        else:
            in_specs.append(pl.BlockSpec(blk, _m4))
            in_meta.append((p, None))
    # viscosity scale, reshaped (mz, nel_plane, nqpc) so the block equals
    # the full trailing dims (a 2D (nel_plane, nqpc) block trips the
    # 8/128-divisibility rule when the plane size is not a multiple of 8)
    in_specs.append(pl.BlockSpec((1, nel_plane, nqpc),
                                 lambda i: (i, z0, z0)))
    # shared strain matrix, replicated per step
    in_specs.append(pl.BlockSpec((nqpc, nd * nbu), lambda i: (z0, z0)))

    out_specs = []
    out_meta = []         # (class p, which) with which in {lo, hi, only}
    out_shapes = []
    dtype = op.scale_visc.dtype
    for p in range(8):
        bx, by, bz = _cls_bits(p)
        zdim, ydim, xdim = cls_shapes[p]
        blk = (1, ydim, xdim, nd)
        if bz == 0:
            for which in ("lo", "hi"):
                out_specs.append(pl.BlockSpec(blk, _m4))
                out_meta.append((p, which))
                out_shapes.append(
                    jax.ShapeDtypeStruct((mz, ydim, xdim, nd), dtype))
        else:
            out_specs.append(pl.BlockSpec(blk, _m4))
            out_meta.append((p, "only"))
            out_shapes.append(
                jax.ShapeDtypeStruct((mz, ydim, xdim, nd), dtype))

    # local slice offsets per 27 element-local nodes, x-fastest
    locs = [(la, lb, lc) for lc in range(3) for lb in range(3)
            for la in range(3)]

    def kernel(*refs):
        ins = refs[: len(in_specs)]
        outs = refs[len(in_specs):]
        par = {}
        for ref, (p, sc) in zip(ins[: len(in_meta)], in_meta):
            par[(p, sc)] = ref
        sv_ref = ins[-2]
        bs_ref = ins[-1]

        # gather: concatenate the 27 local-node slabs along the LANE dim
        # (column order (node, dof) = Bs columns); a stack+reshape merging
        # (27, nd) -> 81 is a relayout Mosaic cannot lower
        slabs = []
        for (la, lb, lc) in locs:
            p = (la & 1) | ((lb & 1) << 1) | ((lc & 1) << 2)
            sa, sb, sc = la >> 1, lb >> 1, lc >> 1
            key = (p, sc if _cls_bits(p)[2] == 0 else None)
            ref = par[key]
            slabs.append(ref[0, sb:sb + my, sa:sa + mx, :])
        xe = jnp.concatenate(slabs, axis=-1).reshape(nel_plane, nbu * nd)

        Bs = bs_ref[...]
        strain = lax.dot_general(
            xe, Bs, (((1,), (1,)), ((), ())),
            precision=lax.Precision.HIGHEST)          # (nel_plane, nqpc)
        strain = strain * sv_ref[0]
        yue = lax.dot_general(
            strain, Bs, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)          # (nel_plane, 81)
        yel = yue.reshape(my, mx, nbu * nd)

        # scatter: per output buffer, group contributions by their (sb, sa)
        # shift and accumulate into ref slices (lax.pad's concat lowering
        # hits Mosaic layout limits on these shapes)
        for ref, (p, which) in zip(outs, out_meta):
            ydim, xdim = cls_shapes[p][1], cls_shapes[p][2]
            groups = {}
            for li, (la, lb, lc) in enumerate(locs):
                pp = (la & 1) | ((lb & 1) << 1) | ((lc & 1) << 2)
                if pp != p:
                    continue
                sa, sb, sc = la >> 1, lb >> 1, lc >> 1
                bz = _cls_bits(p)[2]
                tgt = ("only" if bz else ("lo" if sc == 0 else "hi"))
                if tgt != which:
                    continue
                groups.setdefault((sb, sa), []).append(li)
            ref[0, :, :, :] = jnp.zeros((ydim, xdim, nd), yel.dtype)
            for (sb, sa), lis in groups.items():
                csum = yel[:, :, nd * lis[0]:nd * lis[0] + nd]
                for li in lis[1:]:
                    csum = csum + yel[:, :, nd * li:nd * li + nd]
                ref[0, sb:sb + my, sa:sa + mx, :] = \
                    ref[0, sb:sb + my, sa:sa + mx, :] + csum

    grid = (mz,)
    from jax.experimental.pallas import tpu as pltpu
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=tuple(out_shapes),
        # the (.., xdim, 3) blocks tile to (.., 40, 128) -- the lane dim
        # pads 3 -> 128 -- so 24 double-buffered plane blocks exceed the
        # default 16M scoped-vmem budget; the v5e has 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def mult(subs):
        args = []
        for ref_i, (p, sc) in enumerate(in_meta):
            args.append(subs[p])
        args.append(op.scale_visc.reshape(mz, nel_plane, nqpc))
        args.append(op.Bs)
        raw = call(*args)
        # combine lo/hi partial buffers into the parity grids
        outs = [None] * 8
        zero = jnp.zeros((), raw[0].dtype)
        i = 0
        for p in range(8):
            bz = _cls_bits(p)[2]
            zdim = cls_shapes[p][0]
            if bz == 0:
                lo, hi = raw[i], raw[i + 1]
                i += 2
                # lo[ez] -> plane ez; hi[ez] -> plane ez+1
                pads_lo = [(0, zdim - mz, 0), (0, 0, 0), (0, 0, 0),
                           (0, 0, 0)]
                pads_hi = [(1, zdim - mz - 1, 0), (0, 0, 0), (0, 0, 0),
                           (0, 0, 0)]
                outs[p] = (lax.pad(lo, zero, pads_lo)
                           + lax.pad(hi, zero, pads_hi))
            else:
                outs[p] = raw[i]
                i += 1
        return outs

    return mult
