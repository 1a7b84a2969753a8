"""Accelerator health probing + dispatch watchdog (utils/platform.py) —
the framework's answer to transports that hang without raising (the
reference's cuda→mps→cpu fallback only checks *registration*,
reference train.py:75-79)."""

import io
import sys
import time

from dgcnn_tpu.utils.platform import (
    DispatchWatchdog,
    probe_accelerator,
    resolve_platform,
)


def test_probe_succeeds_on_cpu(monkeypatch):
    # force the subprocess onto the CPU backend for a healthy probe: the
    # env var alone is NOT enough (the container's sitecustomize re-pins
    # the platform — same reason tests/conftest.py re-pins in-process)
    import dgcnn_tpu.utils.platform as plat

    monkeypatch.setattr(
        plat,
        "_PROBE_CODE",
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        + plat._PROBE_CODE,
    )
    assert plat.probe_accelerator(timeout_s=120.0)


def test_probe_times_out_on_wedged_backend(monkeypatch):
    # a subprocess that hangs forever models the wedged-transport case
    import dgcnn_tpu.utils.platform as plat

    monkeypatch.setattr(
        plat, "_PROBE_CODE", "import time; time.sleep(60)"
    )
    t0 = time.perf_counter()
    assert not plat.probe_accelerator(timeout_s=2.0)
    assert time.perf_counter() - t0 < 30.0


def test_resolve_platform_modes(monkeypatch):
    import dgcnn_tpu.utils.platform as plat

    assert resolve_platform("cpu") == "cpu"
    assert resolve_platform("auto") == ""
    monkeypatch.setattr(plat, "probe_accelerator", lambda timeout_s: True)
    assert plat.resolve_platform("probe") == ""
    monkeypatch.setattr(plat, "probe_accelerator", lambda timeout_s: False)
    err = io.StringIO()
    monkeypatch.setattr(sys, "stderr", err)
    assert plat.resolve_platform("probe") == "cpu"
    assert "falling back to CPU" in err.getvalue()


def test_watchdog_fires_once_and_cancels(monkeypatch):
    err = io.StringIO()
    monkeypatch.setattr(sys, "stderr", err)
    wd = DispatchWatchdog(0.1, "probe work").start()
    time.sleep(0.6)
    assert "probe work" in err.getvalue()
    assert err.getvalue().count("still not finished") == 1

    err2 = io.StringIO()
    monkeypatch.setattr(sys, "stderr", err2)
    wd2 = DispatchWatchdog(0.3, "never fires").start()
    wd2.cancel()
    time.sleep(0.6)
    assert err2.getvalue() == ""
    wd.cancel()  # idempotent after firing
