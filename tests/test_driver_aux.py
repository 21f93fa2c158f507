"""Driver auxiliary-output tests: -twosolves banner format and the
-log_view stage summary (the PetscLogStage separation of exSaddle.c:569-618
and 594-599; SURVEY.md section 5 tracing/profiling)."""

import re

from refcompare import run_case


def test_twosolves_banner_and_success_line():
    """-twosolves: warm re-solve in a fresh stage; the banner and the
    'N extra solve(s) succeeded with I iterations and residual norm R'
    line reproduce ExtraSolves (exSaddle.c:569-618)."""
    out, res = run_case(
        "-mx 6 -fs -twosolves -saddle_ksp_monitor_short", ndim=2)
    txt = "\n".join(out)
    assert "Commencing with 1 additional solves." in txt
    m = re.search(r"  (\d+) extra solve\(s\) succeeded with (\d+) "
                  r"iterations and residual norm (\S+) ", txt)
    assert m, txt
    assert int(m.group(1)) == 1
    # warm solve iterations match the monitored first solve
    mon = [ln for ln in out if re.match(r"\s*\d+ KSP Residual norm", ln)]
    assert int(m.group(2)) == len(mon) - 1
    float(m.group(3))
    # the banner warns about cancelled monitors; nested monitor lines must
    # NOT appear between the banner and the success line
    start = next(i for i, ln in enumerate(out)
                 if "Commencing with" in ln)
    end = next(i for i, ln in enumerate(out)
               if "extra solve(s) succeeded" in ln)
    assert not any(re.match(r"\s*\d+ KSP Residual norm", ln)
                   for ln in out[start:end])


def test_twosolves_diverged_banner():
    """A diverging config reports 'ERROR: EXTRA SOLVES(S) DIVERGED!'."""
    out, res = run_case(
        "-mx 4 -twosolves -saddle_ksp_max_it 5", ndim=2)
    assert any("ERROR: EXTRA SOLVES(S) DIVERGED!" in ln for ln in out)


def test_log_view_stage_summary():
    """-log_view: per-stage wall-clock table with the Setup/SolverSetup/
    KSPSolve stages (plus 'Extra Solves' under -twosolves), percentages
    summing to ~100."""
    out, res = run_case("-mx 4 -fs -twosolves -log_view", ndim=2)
    txt = "\n".join(out)
    assert "Stage summary (wall clock):" in txt
    rows = {}
    for ln in out:
        m = re.match(r"\s{2}(\S[\S ]*?)\s+(\d+\.\d+e[+-]\d+) s(?:\s+"
                     r"(\d+\.\d+)%)?\s*$", ln)
        if m:
            rows[m.group(1).strip()] = (float(m.group(2)),
                                        float(m.group(3) or -1))
    for stage in ("Setup", "SolverSetup", "KSPSolve", "Extra Solves",
                  "Total"):
        assert stage in rows, (stage, rows)
    pct = sum(p for name, (t, p) in rows.items() if name != "Total")
    assert abs(pct - 100.0) < 0.5
    assert rows["Total"][0] >= rows["KSPSolve"][0]
