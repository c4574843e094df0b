"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip TPU hardware is unavailable in CI, so sharding tests run on a
virtual 8-device CPU mesh; numerics tests are platform-agnostic.  The env
vars must be set before jax initializes its backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is overridden by the TPU tunnel plugin in
# this image; the config route reliably pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.device_count()} ({jax.devices()[0].platform})"
