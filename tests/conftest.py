"""Test harness: force an 8-virtual-device CPU backend.

Multi-host/multi-chip logic is validated without a cluster via XLA's
forced host platform device count (SURVEY.md §4 item 3).  The platform
must be set through `jax.config` (not the env var) because the container
boot hook imports jax before pytest starts, latching JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running learning tests"
    )
