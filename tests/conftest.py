"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before the first jax import anywhere in the test process
(SURVEY.md §4: the TPU answer to "test multi-node without a cluster").
"""
import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU
# tunnel), which is slow and single-device; tests want 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process simulations)")
