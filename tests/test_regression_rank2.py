"""2-rank regression tests vs testref/*_2.ref (Makefile:261-494, mpiexec -n 2).

Run with nranks=2 virtual ranks: parallel defaults (bjacobi with DMDA
ownership blocks, redundant coarse) reproduce the 2-rank solver behavior
serially. Tolerances: the reference's 2-rank runs differ from 1-rank only in
summation order, so histories match to the standard tolerance; cases whose
1-vs-2-rank iteration counts differ in the reference itself (lame_2: 145 vs
146) use int_exact=False."""

from refcompare import check_against_ref


def test_exSaddle2d_2():
    check_against_ref(
        "exSaddle2d_2",
        "-model 0 -mx 4 -diagnostics -saddle_ksp_max_it 100 "
        "-saddle_ksp_converged_reason -saddle_pc_type jacobi",
        ndim=2, nranks=2)


def test_exSaddle2d_mg_2():
    check_against_ref(
        "exSaddle2d_mg_2",
        "-model 0 -mx 16 -mg -nlevels 3 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_redundant_pc_factor_mat_solver_type umfpack",
        ndim=2, nranks=2)


def test_exSaddle2d_fs_2():
    check_against_ref(
        "exSaddle2d_fs_2",
        "-model 0 -fs -mx 6 -diagnostics -saddle_ksp_monitor_short",
        ndim=2, nranks=2)


def test_exSaddle2d_lame_2():
    # reference's own 1-rank/2-rank iteration counts differ (145/146):
    # the count is roundoff-sensitive, compare ints loosely
    check_against_ref(
        "exSaddle2d_lame_2",
        "-model 6 -saddle_pc_type jacobi -saddle_ksp_converged_reason -mx 8 "
        "-diagnostics",
        ndim=2, lame=True, nranks=2, int_exact=False)


def test_exSaddle2d_lame_mg_2():
    check_against_ref(
        "exSaddle2d_lame_mg_2",
        "-mx 16 -mg -nlevels 3 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_redundant_pc_factor_mat_solver_type umfpack",
        ndim=2, lame=True, nranks=2)


def test_exSaddle2d_lame_fs_2():
    check_against_ref(
        "exSaddle2d_lame_fs_2",
        "-model 6 -fs -mx 6 -diagnostics -saddle_ksp_monitor_short "
        "-saddle_ksp_converged_reason",
        ndim=2, lame=True, nranks=2)


def test_exSaddle3d_2():
    check_against_ref(
        "exSaddle3d_2",
        "-saddle_pc_type jacobi -diagnostics -model 1 "
        "-saddle_ksp_converged_reason -mx 4 -my 7 -mz 5 -saddle_ksp_max_it "
        "10",
        ndim=3, nranks=2)


def test_exSaddle3d_mg_2():
    check_against_ref(
        "exSaddle3d_mg_2",
        "-model 2 -sinker_n 1 -mx 8 -mg -nlevels 2 -diagnostics "
        "-saddle_ksp_type fgmres -saddle_mg_levels_ksp_type gmres "
        "-saddle_mg_levels_pc_type jacobi -saddle_mg_levels_ksp_max_it 10 "
        "-saddle_ksp_monitor_short "
        "-saddle_mg_coarse_redundant_pc_factor_mat_solver_type umfpack",
        ndim=3, nranks=2)


def test_exSaddle3d_fs_2():
    check_against_ref(
        "exSaddle3d_fs_2",
        "-model 2 -sinker_n 1 -fs -mx 4 -diagnostics "
        "-saddle_ksp_monitor_short",
        ndim=3, nranks=2)


def test_exSaddle3d_lame_2():
    check_against_ref(
        "exSaddle3d_lame_2",
        "-model 6 -saddle_pc_type jacobi -saddle_ksp_converged_reason -mx 4 "
        "-diagnostics",
        ndim=3, lame=True, nranks=2)


def test_exSaddle3d_lame_mg_2():
    check_against_ref(
        "exSaddle3d_lame_mg_2",
        "-model 6 -mx 6 -mg -nlevels 2 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_redundant_pc_factor_mat_solver_type umfpack",
        ndim=3, lame=True, nranks=2)


def test_exSaddle3d_lame_fs_2():
    check_against_ref(
        "exSaddle3d_lame_fs_2",
        "-model 6 -fs -mx 4 -diagnostics -saddle_ksp_monitor_short "
        "-saddle_fieldsplit_u_ksp_max_it 10 "
        "-saddle_fieldsplit_p_ksp_type preonly -saddle_ksp_max_it 10",
        ndim=3, lame=True, nranks=2)
