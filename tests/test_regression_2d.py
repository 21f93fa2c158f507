"""2D Stokes regression tests vs /root/reference/testref (Makefile:254-316).

Single-shard equivalents of the reference's 1-rank cases. Numeric tolerance:
residual histories to 1e-3 relative (different summation order than PETSc);
iteration counts exact."""

import pytest

from refcompare import check_against_ref


def test_exSaddle2d_1():
    check_against_ref(
        "exSaddle2d_1",
        "-model 0 -mx 4 -diagnostics -saddle_ksp_max_it 100 "
        "-saddle_ksp_converged_reason -saddle_pc_type jacobi",
        ndim=2)


def test_exSaddle2d_fs_1():
    check_against_ref(
        "exSaddle2d_fs_1",
        "-model 0 -fs -mx 6 -diagnostics -saddle_ksp_monitor_short",
        ndim=2)


def test_exSaddle2d_mg_1():
    check_against_ref(
        "exSaddle2d_mg_1",
        "-model 0 -mx 16 -mg -nlevels 3 -diagnostics -saddle_ksp_type fgmres "
        "-saddle_mg_levels_ksp_type gmres -saddle_mg_levels_pc_type jacobi "
        "-saddle_mg_levels_ksp_max_it 10 -saddle_ksp_monitor_short "
        "-saddle_mg_coarse_pc_factor_mat_solver_type umfpack",
        ndim=2)


def test_exSaddle2d_mms_1():
    check_against_ref(
        "exSaddle2d_mms_1",
        "-saddle_pc_type lu -saddle_pc_factor_mat_solver_type umfpack "
        "-model 101 -check_solution -saddle_ksp_monitor_short -mx 16 "
        "-constant_pressure_nullspace",
        ndim=2)
