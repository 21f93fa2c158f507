"""ABF (Approximate Block Factorization, abf.opts) regression tests.

These configurations use Chebyshev smoothers with gmres eigenvalue
estimation on PETSc's internal noise vector, which is not reproducible
bit-exactly; monitor histories are compared loosely (see
refcompare.compare_monitor_loose) -- the reference's own 1-rank vs 2-rank
histories differ comparably for such configs."""

from refcompare import ESTEIG_RITZ_OVERRIDES, check_against_ref

ABF = "/root/reference"  # abf.opts lives next to the reference sources


def test_exSaddle2d_ar_1():
    check_against_ref(
        "exSaddle2d_ar_1",
        "-options_file abf.opts -saddle_ksp_monitor_short -model 0 -mx 32 "
        "-my 32 -options_left -size_y 0.1",
        ndim=2, monitor_mode="loose", cwd=ABF,
        hist_rtol=0.06, its_slack=1)


def test_exSaddle3d_ar_1():
    check_against_ref(
        "exSaddle3d_ar_1",
        "-options_file abf.opts -saddle_ksp_monitor_short -model 0 -mx 6 "
        "-my 6 -mz 6 -options_left -saddle_fieldsplit_u_ksp_converged_reason "
        "-size_z 0.1",
        ndim=3, monitor_mode="loose", cwd=ABF,
        hist_rtol=0.06, its_slack=1)


def test_exSaddle3d_pseudoice_1():
    """The flagship case INCLUDING the full 338-line -ksp_view solver tree
    (testref/exSaddle3d_pseudoice_1.ref:27-365), line-diffed byte-for-byte
    except for two documented runtime-value classes:

    - 'eigenvalues estimate via gmres min/max' -- the raw Ritz extremes of
      a 10-iteration GMRES esteig probe on PETSc's deterministic noisy RHS
      (KSPSetNoisy_Private; exact formula PETSc-internal and empirically
      unrecoverable -- see krylov.noisy_vector's documented 40-candidate
      sweep). With the sin(i) stand-in, emax matches to <= 0.6% on both
      levels; emin is the bottom of an UNCONVERGED 10-step Arnoldi whose
      true lambda_min is ~3e-7, i.e. pure probe noise (candidate spread
      0.007..0.15 vs refs 0.059/0.068), compared at rtol 0.65. Not a
      weakening of the solver check: BOTH consequential Chebyshev bounds
      derive from emax alone (used-min = 0.2*emax, used-max = 1.1*emax;
      transform 0,0.2,0,1.1) and are pinned by the next line at rtol 0.02.
      Closer-Ritz candidates (glibc rand stream, sin(i^2): emin to 1-7%)
      shifted the bounds enough to change the descent path (history
      deviations to ~40%, 21 its) and were rejected: behavior parity is
      the binding contract.
    - 'eigenvalue estimates used' -- derived from emax; matches to ~0.6%,
      compared at rtol 0.02.

    Monitor history: measured deviation <= 3.9% at every iteration with
    the reference's exact 20-iteration count; bounds set at 0.06/1."""
    check_against_ref(
        "exSaddle3d_pseudoice_1",
        "-saddle_ksp_view -options_file abf.opts -model 11 -size_x 0.1 "
        "-mx 6 -saddle_ksp_monitor_short",
        ndim=3, monitor_mode="loose", cwd=ABF,
        rtol_overrides=ESTEIG_RITZ_OVERRIDES,
        hist_rtol=0.06, its_slack=1)
