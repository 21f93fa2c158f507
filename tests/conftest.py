"""Test configuration: run JAX on a virtual multi-device CPU mesh in float64.

Regression tests compare against the reference's testref/ behavior, which is
float64 CPU arithmetic; distributed tests use 8 virtual CPU devices
(xla_force_host_platform_device_count) to exercise jax.sharding without TPU
hardware.
"""

import os

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. "axon"); tests
# must run on CPU, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
