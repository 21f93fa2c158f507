"""ILDL / ILUPACK regression tests vs testref/ (opt-in cases,
Makefile:494-506).

The reference preconditioner is ILUPACK's Fortran DSYMiluc / AMGfactor with
MC64 matching + METIS ordering; this framework's native C++ equivalents
(exsaddle_tpu/native/ildl.cpp + order.cpp) use MC64 maximum-product
matching scalings, AMD/nested-dissection orderings, inverse-based dropping
and condest-driven pivot deferral. The factorizations still differ in
detail, so residual histories differ -- but iteration counts must be AT
OR BELOW the reference's (1.0x bounds: 7 on exSaddle3d_ildl_1, 2 on
exSaddle3d_ilupack_1), and converged solution diagnostics must match (the
solution is preconditioner-independent at convergence)."""

import re
import numpy as np
import pytest

from refcompare import run_case, REF_DIR, _monitor_value


def _ref_lines(name):
    with open(f"{REF_DIR}/{name}.ref") as f:
        return [ln.rstrip("\n") for ln in f]


def _diag_values(lines):
    out = {}
    for ln in lines:
        m = re.match(r"\|(.+?)\|_(\S+)\s+(.*)", ln)
        if m:
            vals = [float(v) for v in m.group(3).replace(",", " ").split()]
            out[(m.group(1), m.group(2))] = vals
    return out


def _iters(lines):
    return sum(1 for ln in lines if _monitor_value(ln) is not None) - 1


@pytest.mark.slow
def test_exSaddle3d_ildl_1():
    ref = _ref_lines("exSaddle3d_ildl_1")
    out, res = run_case(
        "-diagnostics -mx 8 -model 6 -eta1 100 -eta0 1 "
        "-saddle_ksp_monitor_short -saddle_pc_type ildl -options_left "
        "-saddle_pc_ildl_droptol 1e-3 -saddle_ksp_pc_side right",
        ndim=3)
    # banner parity
    assert out[0] == "Boundary Conditions: SolCx"
    assert out[1] == "ModelType: StokesOneSinker"
    fill = [ln for ln in out if ln.startswith("relative fill ILDL/A:")]
    assert len(fill) == 1
    # matrix nnz must agree with the reference's (+-1 stored entry)
    nz = int(re.search(r"wrt (\d+) nz", fill[0]).group(1))
    assert abs(nz - 1458123) <= 1
    # at or below the reference's 7 iterations (AMD + MC64: measured 7)
    its_ref = _iters(ref)
    its_out = _iters(out)
    assert its_out <= its_ref, (its_out, its_ref)
    final = [_monitor_value(ln) for ln in out
             if _monitor_value(ln) is not None][-1]
    assert final < 5e-7
    # converged diagnostics match the reference
    dr = _diag_values(ref)
    do = _diag_values(out)
    assert dr.keys() == do.keys() and len(dr) >= 10
    # per-field scale: |p|_min is ~1e-3 on a field of magnitude ~1, and the
    # solve itself only converges to rtol 1e-5, so atol rides on the field's
    # max-norm, not the component's own size
    field_scale = {}
    for (f, which), vals in dr.items():
        field_scale[f] = max(field_scale.get(f, 0.0),
                             max(abs(v) for v in vals))
    for (f, which), vals in dr.items():
        np.testing.assert_allclose(
            do[(f, which)], vals, rtol=1e-3,
            atol=1e-4 * field_scale[f])
    # option table parity
    assert "There are no unused options." in out


def test_exSaddle3d_ilupack_1():
    ref = _ref_lines("exSaddle3d_ilupack_1")
    out, res = run_case(
        "-saddle_pc_type ilupack -saddle_pc_ilupack_droptol 1e-3 "
        "-saddle_pc_ilupack_condest 100 -saddle_pc_ilupack_droptolS 1e-4 "
        "-mx 4 -saddle_ksp_monitor_short",
        ndim=3)
    assert out[0] == "Boundary Conditions: SolCx"
    # a GENUINE multilevel factorization: more than one level completed
    lvl = [re.match(r"factorization successful with (\d+) levels completed",
                    ln) for ln in out]
    lvl = [m for m in lvl if m]
    assert len(lvl) == 1 and int(lvl[0].group(1)) > 1
    assert any(ln.startswith("final elbow space factor=") for ln in out)
    its_ref = _iters(ref)         # 2
    its_out = _iters(out)
    assert its_out <= its_ref, (its_out, its_ref)
    final = [_monitor_value(ln) for ln in out
             if _monitor_value(ln) is not None][-1]
    r0 = [_monitor_value(ln) for ln in out
          if _monitor_value(ln) is not None][0]
    assert final / r0 < 2e-5


def test_ildl_exact_factorization_is_direct_solve():
    out, res = run_case(
        "-mx 3 -model 6 -saddle_ksp_monitor_short -saddle_pc_type ildl "
        "-saddle_pc_ildl_droptol 0.0 -saddle_ksp_pc_side right "
        "-saddle_ksp_max_it 5",
        ndim=3)
    assert _iters(out) == 1
