"""ASM regression tests vs testref/ (Makefile:297, 410, 417).

The reference runs these under mpiexec -n {9,8,4}; the virtual-rank
decomposition (exsaddle_tpu/decomp.py) reproduces the DMDA rank grids and
element-aligned patches, so histories match digit-for-digit serially."""

from refcompare import check_against_ref


def test_exSaddle2d_asm_1():
    check_against_ref(
        "exSaddle2d_asm_1",
        "-mx 12 -saddle_pc_type asm -saddle_pc_asm_dm_subdomains -set_ksp_dm "
        "-options_left -saddle_ksp_monitor_short -saddle_sub_ksp_type preonly "
        "-saddle_sub_pc_type lu -saddle_sub_pc_factor_mat_solver_type umfpack "
        "-dmdafe_overlap 1 -saddle_ksp_rtol 1e-4",
        ndim=2, nranks=9)


def test_exSaddle3d_asm_1():
    check_against_ref(
        "exSaddle3d_asm_1",
        "-mx 6 -saddle_pc_type asm -saddle_pc_asm_dm_subdomains -set_ksp_dm "
        "-options_left -saddle_ksp_monitor_short -saddle_sub_ksp_type preonly "
        "-saddle_sub_pc_type lu -saddle_sub_pc_factor_mat_solver_type "
        "umfpack",
        ndim=3, nranks=8)


def test_exSaddle3d_mg_asm_1():
    check_against_ref(
        "exSaddle3d_mg_asm_1",
        "-options_left -mg -nlevels 2 -saddle_mg_levels_ksp_type gmres "
        "-saddle_mg_levels_pc_type asm -saddle_mg_levels_pc_asm_dm_subdomains "
        "-dmdafe_overlap 1 -saddle_ksp_monitor_short -saddle_ksp_pc_side "
        "right -saddle_mg_coarse_redundant_pc_factor_mat_solver_type umfpack "
        "-saddle_mg_levels_sub_pc_type lu "
        "-saddle_mg_levels_sub_pc_factor_mat_solver_type umfpack "
        "-mx 6 -my 4 -mz 4",
        ndim=3, nranks=4)
