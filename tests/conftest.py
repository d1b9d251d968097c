"""Test config: force a true CPU backend (the container's sitecustomize
registers a remote TPU backend and overrides JAX_PLATFORMS, so the env var
alone is not enough) with a virtual 8-device mesh for sharding tests
(SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
