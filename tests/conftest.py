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


import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow (compile-heavy) tests — the FULL "
             "gate for round ends; the default selection is the fast "
             "inner-loop suite",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: needs --runslow (full gate)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
