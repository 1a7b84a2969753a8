"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective logic is exercised without TPU pods (SURVEY §4 item 5).

The container's sitecustomize force-registers the axon TPU platform and
sets jax_platforms="axon,cpu" at interpreter start, so exporting
JAX_PLATFORMS is not enough — we override the live jax config before any
backend is initialized (conftest imports before all test modules)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
