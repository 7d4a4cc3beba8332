"""Test configuration: run on CPU with 8 fake devices and f64 enabled.

This mirrors the standard JAX recipe for testing multi-chip sharding without
hardware (SURVEY.md §4: xla_force_host_platform_device_count) and gives the
f64 precision needed to meet the reference's SE3 test tolerance
(test_ceres_se3.cpp:80-81).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon TPU plugin force-registers itself via config, so the
# env var alone is not enough; override after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
