"""Test configuration: run JAX on a virtual multi-device CPU mesh in float64.

Regression tests compare against the reference's testref/ behavior, which is
float64 CPU arithmetic; distributed tests use 8 virtual CPU devices
(xla_force_host_platform_device_count) to exercise jax.sharding without TPU
hardware.
"""

import os

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. "axon"); tests
# must run on CPU, so override rather than setdefault.
# EXSADDLE_TEST_TPU=1 keeps the real accelerator visible instead -- the
# opt-in mode for the TPU-only performance-band tests
# (tests/test_perf_bands.py); the rest of the suite is not expected to
# digit-match references on TPU arithmetic.
_ON_TPU = os.environ.get("EXSADDLE_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache (suite hygiene): every test jits its own
# solver programs; across tests and across runs most are identical. Purely
# a compile-time cache -- zero numerical behavior change.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:                                  # pragma: no cover
    pass
