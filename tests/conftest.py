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

# Serving ticks route fused-vs-unfused on LIVE LATENCY measurements by
# default (runtime.session._ServeRouter) — nondeterministic on a loaded CI
# host.  Tests pin the fused path so structural assertions
# (last_serve_fused, stats.fused_ticks) are deterministic; the router's own
# behavior is covered by tests/test_serving.py::test_serve_router_*, which
# construct routers with mode='auto' explicitly.
os.environ.setdefault("STC_SERVE_ROUTE", "fused")
