"""Test env: force CPU backend with 8 virtual devices for sharding tests.

The container's sitecustomize registers a TPU backend at interpreter start
(before this conftest runs), so the env var alone is not enough — we also
flip the platform through jax.config, which works post-registration.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
