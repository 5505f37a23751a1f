"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without a TPU pod (SURVEY.md §4).

Note: the axon sitecustomize imports jax before conftest runs, so the
JAX_PLATFORMS env var is already latched — use jax.config.update instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
