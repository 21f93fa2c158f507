"""-ksp_view: PETSc-format solver-tree printer.

Structural equivalent of KSPView/PCView as exercised by the reference
(testref/exSaddle3d_pseudoice_1.ref:28+, exSaddle3d_ilupack_1.ref): prints
the nested KSP/PC/Mat object tree in PETSc's wording and indentation.
Runtime statistics PETSc embeds (restart counts, factor nnz, I-node info,
UMFPACK control tables) are hardware/library internals and are omitted or
summarized; the structural lines -- types, tolerances, sides, norm types,
split/level organization, matrix sizes and nonzero counts -- match."""

import numpy as np

from exsaddle_tpu import precond, precond_mg
from exsaddle_tpu.krylov import fmt_petsc_g


def _g(v):
    return fmt_petsc_g(v)


def view_ksp(ksp, log=print, indent=0, nranks=1, mat_label=None):
    sp = " " * indent
    cfg = ksp.cfg
    pre = f"({cfg.prefix}) " if cfg.prefix else ""
    log(f"{sp}KSP Object: {pre}{nranks} MPI processes")
    log(f"{sp}  type: {cfg.type}")
    if cfg.type in ("gmres", "fgmres"):
        log(f"{sp}    restart={cfg.restart}, using Classical (unmodified) "
            "Gram-Schmidt Orthogonalization with no iterative refinement")
        log(f"{sp}    happy breakdown tolerance 1e-30")
    elif cfg.type == "gcr":
        log(f"{sp}    restart = {cfg.restart} ")
    elif cfg.type == "chebyshev":
        emin = getattr(ksp, "cheb_emin_used", None)
        emax = getattr(ksp, "cheb_emax_used", None)
        if emin is not None:
            log(f"{sp}    eigenvalue estimates used:  min = {_g(emin)}, "
                f"max = {_g(emax)}")
        t = cfg.cheb_esteig_transform
        log(f"{sp}    eigenvalues estimated using gmres with translations "
            f" [{_g(t[0])} {_g(t[1])}; {_g(t[2])} {_g(t[3])}]")
    guess = ("nonzero initial guess" if cfg.initial_guess_nonzero
             else "initial guess is zero")
    log(f"{sp}  maximum iterations={cfg.max_it}, {guess}")
    log(f"{sp}  tolerances:  relative={_g(cfg.rtol)}, "
        f"absolute={_g(cfg.abstol)}, divergence={_g(cfg.dtol)}")
    log(f"{sp}  {cfg.resolved_pc_side()} preconditioning")
    log(f"{sp}  using {cfg.resolved_norm_type().upper()} norm type for "
        "convergence test")
    view_pc(ksp.pc, cfg.prefix, log, indent, nranks,
            pmat=getattr(ksp, "pmat", None), amat=getattr(ksp, "amat", None),
            mat_label=mat_label)


def _mat_lines(mat, log, indent, nranks, label=None, name=None):
    sp = " " * indent
    if mat is None:
        return
    nm = f"{name} " if name else ""
    log(f"{sp}Mat Object: {nm}{nranks} MPI processes")
    log(f"{sp}  type: seqaij" if nranks == 1 else f"{sp}  type: mpiaij")
    n = getattr(mat, "n", None)
    nnz = None
    A = getattr(mat, "_csr", None)
    if A is not None and not callable(A):
        nnz = A.nnz
    if nnz is not None:
        log(f"{sp}  rows={n}, cols={n}")
        log(f"{sp}  total: nonzeros={nnz}, allocated nonzeros={nnz}")
    else:
        log(f"{sp}  rows={n}, cols={n}")
    log(f"{sp}  total number of mallocs used during MatSetValues calls=0")


def view_pc(pc, prefix, log=print, indent=0, nranks=1, pmat=None, amat=None,
            mat_label=None):
    sp = " " * indent
    pre = f"({prefix}) " if prefix else ""
    log(f"{sp}PC Object: {pre}{nranks} MPI processes")

    def mat_footer():
        log(f"{sp}  linear system matrix = precond matrix:")
        _mat_lines(pmat, log, indent + 2, nranks, name=mat_label)

    if isinstance(pc, precond.PCNone):
        log(f"{sp}  type: none")
        mat_footer()
    elif isinstance(pc, precond.PCJacobi):
        log(f"{sp}  type: jacobi")
        mat_footer()
    elif isinstance(pc, precond.PCILU):
        log(f"{sp}  type: ilu")
        log(f"{sp}    out-of-place factorization")
        log(f"{sp}    0 levels of fill")
        log(f"{sp}    tolerance for zero pivot 2.22045e-14")
        log(f"{sp}    matrix ordering: natural")
        log(f"{sp}    factor fill ratio given 1., needed 1.")
        mat_footer()
    elif isinstance(pc, precond.PCLU):
        log(f"{sp}  type: lu")
        log(f"{sp}    out-of-place factorization")
        log(f"{sp}    tolerance for zero pivot 2.22045e-14")
        log(f"{sp}    matrix ordering: nd")
        mat_footer()
    elif isinstance(pc, precond.PCBJacobi):
        log(f"{sp}  type: bjacobi")
        log(f"{sp}    number of blocks = {len(pc.subs)}")
        log(f"{sp}    Local solve is same for all blocks, in the following "
            "KSP and PC objects:")
        view_ksp(pc.subs[0], log, indent + 4, 1)
        mat_footer()
    elif isinstance(pc, precond.PCASM):
        log(f"{sp}  type: asm")
        log(f"{sp}    total subdomain blocks = {len(pc.subksps)}, "
            f"amount of overlap = {getattr(pc, 'overlap', 0)}")
        log(f"{sp}    restriction/interpolation type - RESTRICT")
        log(f"{sp}    Local solve is same for all blocks, in the following "
            "KSP and PC objects:")
        view_ksp(pc.subksps[0], log, indent + 4, 1)
        mat_footer()
    elif isinstance(pc, precond.PCFieldSplitSchurUpper):
        log(f"{sp}  type: fieldsplit")
        log(f"{sp}    FieldSplit with Schur preconditioner, "
            "factorization UPPER")
        log(f"{sp}    Preconditioner for the Schur complement formed from "
            "user provided matrix")
        log(f"{sp}    Split info:")
        log(f"{sp}    Split number 0 Defined by IS")
        log(f"{sp}    Split number 1 Defined by IS")
        log(f"{sp}    KSP solver for A00 block")
        view_ksp(pc.ksp_A00, log, indent + 4, nranks)
        log(f"{sp}    KSP solver for S = A11 - A10 inv(A00) A01 ")
        view_ksp(pc.ksp_schur, log, indent + 4, nranks,
                 mat_label="Mpscaled")
    elif isinstance(pc, precond.PCFieldSplitAdditive):
        log(f"{sp}  type: fieldsplit")
        log(f"{sp}    FieldSplit with ADDITIVE composition: total splits = "
            f"{len(pc.splits)}")
        for i, (idx, sub) in enumerate(pc.splits):
            log(f"{sp}    Split number {i} Defined by IS")
        for i, (idx, sub) in enumerate(pc.splits):
            log(f"{sp}    KSP solver for split {i}")
            view_ksp(sub, log, indent + 4, nranks)
    elif isinstance(pc, precond_mg.PCMG):
        log(f"{sp}  type: mg")
        log(f"{sp}    type is MULTIPLICATIVE, levels={pc.nlevels} cycles=v")
        log(f"{sp}      Cycles per PCApply=1")
        if getattr(pc, "galerkin", False):
            log(f"{sp}      Using Galerkin computed coarse grid matrices")
        else:
            log(f"{sp}      Not using Galerkin computed coarse grid "
                "matrices")
        log(f"{sp}  Coarse grid solver -- level "
            "-------------------------------")
        view_ksp(pc.coarse_ksp, log, indent + 4, nranks)
        for k, lvl in enumerate(pc.levels):
            log(f"{sp}  Down solver (pre-smoother) on level {k + 1} "
                "-------------------------------")
            view_ksp(lvl.smoother, log, indent + 4, nranks)
            log(f"{sp}  Up solver (post-smoother) same as down solver "
                "(pre-smoother)")
        mat_footer()
    elif isinstance(pc, precond.PCILDL):
        log(f"{sp}  type: ildl")
        log(f"{sp}    ILDL: incomplete LDL^T with drop tolerance")
        log(f"{sp}    factor nonzeros (incl. diagonal) = {pc.fact.nnz}")
        mat_footer()
    elif isinstance(pc, precond.PCILUPACK):
        log(f"{sp}  type: ilupack")
        log(f"{sp}    ILUPACK: multilevel incomplete factorization")
        mat_footer()
    else:
        log(f"{sp}  type: {type(pc).__name__}")
        mat_footer()
