"""TPU-only performance bands (VERDICT r4 item 3: pin perf so it cannot
drift). Runs the bench's own measurement functions at the bench scale and
asserts the hot-apply time, per-outer-iteration solve time, and the
mx=32 iteration/round counts against stored bands.

Bands are set from round-5 measurements on the tunneled v5e with ~30%
headroom for the chip's documented run-to-run variance (the bench now
reports min/median/max spreads): apply median ~0.45-0.6 ms, tuned solve
~78 ms/outer / 27 its / 3 rounds. A regression of the round-3->4 kind
(ms/outer 115 -> 132) or an iteration blowup fails here; impossibly fast
values (the tunnel's block_until_ready early-return failure mode) fail
the lower bounds.

Run with the real chip visible:
    EXSADDLE_TEST_TPU=1 python -m pytest tests/test_perf_bands.py -m slow
(the default conftest pins the suite to the virtual CPU mesh, where
these tests skip).
"""

import pytest

import jax


pytestmark = pytest.mark.slow


def _tpu_only():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("performance bands are measured on the TPU only")


def test_apply_time_band_mx32():
    _tpu_only()
    from bench import bench_apply
    r = bench_apply(32, inner=50, reps=5)
    t = r["t_apply_us"]
    # the chip itself swings ~1.7x between quiet and busy phases
    # (round-5 measured 455..793 us for the identical program; the
    # bench spread documents each run) -- the band is set to catch
    # step-regressions, not tenancy noise
    assert 220.0 <= t <= 950.0, f"t_apply_us {t} outside [220, 950]"


def test_solve_bands_mx32():
    _tpu_only()
    from bench import bench_solve
    r = bench_solve(32, 1e-8)
    assert r["solve_converged"]
    ms = r["solve_ms_per_outer_it"]
    assert 40.0 <= ms <= 120.0, f"ms/outer {ms} outside [40, 120]"
    its = r["solve_outer_its"]
    assert 21 <= its <= 34, f"inner its {its} outside [21, 34]"
    assert 2 <= r["solve_ir_rounds"] <= 4, r["solve_ir_rounds"]
