"""3D Stokes + Lame regression tests vs testref/ (Makefile:361-513)."""

import pytest

from refcompare import check_against_ref


def test_exSaddle3d_1():
    check_against_ref(
        "exSaddle3d_1",
        "-saddle_pc_type jacobi -diagnostics -model 1 "
        "-saddle_ksp_converged_reason -mx 4 -my 7 -mz 5 -saddle_ksp_max_it 10",
        ndim=3)


def test_exSaddle3d_fs_1():
    check_against_ref(
        "exSaddle3d_fs_1",
        "-model 2 -sinker_n 1 -fs -mx 4 -diagnostics "
        "-saddle_ksp_monitor_short",
        ndim=3)


def test_exSaddle3d_mg_1():
    check_against_ref(
        "exSaddle3d_mg_1",
        "-model 2 -sinker_n 1 -mx 8 -mg -nlevels 2 -diagnostics "
        "-saddle_ksp_type fgmres -saddle_mg_levels_ksp_type gmres "
        "-saddle_mg_levels_pc_type jacobi -saddle_mg_levels_ksp_max_it 10 "
        "-saddle_ksp_monitor_short "
        "-saddle_mg_coarse_pc_factor_mat_solver_type umfpack",
        ndim=3)


def test_exSaddle3d_lame_1():
    check_against_ref(
        "exSaddle3d_lame_1",
        "-model 6 -saddle_pc_type jacobi -saddle_ksp_converged_reason "
        "-mx 4 -diagnostics",
        ndim=3, lame=True)


def test_exSaddle3d_lame_3():
    check_against_ref(
        "exSaddle3d_lame_3",
        "-model 2 -lambda1 10 -mu1 100 -saddle_ksp_monitor_short "
        "-saddle_pc_type jacobi -saddle_ksp_max_it 10 -saddle_ksp_type gmres "
        "-saddle_ksp_pc_side right -mx 4 -diagnostics",
        ndim=3, lame=True)


def test_exSaddle3d_lame_4():
    check_against_ref(
        "exSaddle3d_lame_4",
        "-model 8 -lambda1 10 -lambda0 10 -saddle_ksp_monitor_short "
        "-saddle_pc_type jacobi -saddle_ksp_max_it 10 -saddle_ksp_type gmres "
        "-saddle_ksp_pc_side right -mx 4 -diagnostics",
        ndim=3, lame=True)


def test_exSaddle3d_lame_5():
    check_against_ref(
        "exSaddle3d_lame_5",
        "-model 9 -saddle_ksp_monitor_short -saddle_pc_type jacobi "
        "-saddle_ksp_max_it 10 -saddle_ksp_type gmres -saddle_ksp_pc_side "
        "right -mx 4 -diagnostics",
        ndim=3, lame=True)


def test_exSaddle3d_lame_fs_1():
    check_against_ref(
        "exSaddle3d_lame_fs_1",
        "-model 6 -fs -mx 4 -diagnostics -saddle_ksp_monitor_short "
        "-saddle_fieldsplit_u_ksp_max_it 10 "
        "-saddle_fieldsplit_p_ksp_type preonly -saddle_ksp_max_it 10",
        ndim=3, lame=True)


def test_exSaddle3d_lame_mg_1():
    check_against_ref(
        "exSaddle3d_lame_mg_1",
        "-model 6 -mx 6 -mg -nlevels 2 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_pc_factor_mat_solver_type umfpack",
        ndim=3, lame=True)


@pytest.mark.slow
def test_exSaddle3d_mg_fs_coarse_1():
    """Full output incl. the complete 141-line -ksp_view solver tree
    (testref/exSaddle3d_mg_fs_coarse_1.ref:23-163, Makefile:389): nested
    fieldsplit-Schur coarse solver inside a rediscretized saddle PCMG,
    with the coarse Schur-pre named Mpscaled_coarse (exSaddle.c:369) and
    the GOTCHA'd coarse convergence test (exSaddle.c:361)."""
    check_against_ref(
        "exSaddle3d_mg_fs_coarse_1",
        "-saddle_ksp_view -mg -nlevels 2 -fs_coarse "
        "-saddle_mg_levels_ksp_type gmres "
        "-saddle_ksp_monitor_short -saddle_ksp_converged_reason "
        "-saddle_mg_coarse_fieldsplit_u_pc_type jacobi "
        "-saddle_mg_coarse_fieldsplit_p_pc_type jacobi "
        "-saddle_mg_coarse_ksp_type fgmres "
        "-saddle_mg_coarse_ksp_convergence_test default "
        "-saddle_mg_levels_pc_type jacobi",
        # deeply nested iterative solves (fgmres coarse fieldsplit inside MG)
        # amplify rounding-order differences to ~0.3%
        ndim=3, rtol=2e-2)
