"""2D Lame regression tests vs testref/ (Makefile:319-359)."""

from refcompare import check_against_ref


def test_exSaddle2d_lame_1():
    # the reference's own 1-rank vs 2-rank runs disagree on the iteration
    # count here (145 vs 146, testref/exSaddle2d_lame_{1,2}.ref) -- this
    # 145-iteration Jacobi solve sits on the rtol boundary, so we accept the
    # count within the reference's own partitioning spread (int_exact=False)
    check_against_ref(
        "exSaddle2d_lame_1",
        "-model 6 -saddle_pc_type jacobi -saddle_ksp_converged_reason "
        "-mx 8 -diagnostics",
        ndim=2, lame=True, int_exact=False)


def test_exSaddle2d_lame_fs_1():
    check_against_ref(
        "exSaddle2d_lame_fs_1",
        "-model 6 -fs -mx 6 -diagnostics -saddle_ksp_monitor_short "
        "-saddle_ksp_converged_reason",
        ndim=2, lame=True)


def test_exSaddle2d_lame_mg_1():
    check_against_ref(
        "exSaddle2d_lame_mg_1",
        "-mx 16 -mg -nlevels 3 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_pc_factor_mat_solver_type umfpack",
        ndim=2, lame=True)
