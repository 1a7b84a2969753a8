"""Accelerator health probing and a first-dispatch watchdog.

The reference picks its device by ASKING torch what exists
(cuda→mps→cpu, reference train.py:75-79) — there, availability implies
usability. On a remote-attached TPU the platform can be *registered* yet
*unreachable*: the transport can wedge so hard that even a 128×128 matmul
never returns (observed 2026-08-17: >4 h outage; every dispatch hung
indefinitely, no error raised). Two consequences shape this module:

  * probing must EXECUTE a dispatch, not inspect device lists — and it
    must run in a SUBPROCESS, because once this process touches the
    backend, JAX cannot be re-pinned to CPU (`--platform probe`);
  * a run that has already committed to the accelerator can only be
    diagnosed, not migrated — the watchdog prints an actionable hint if
    the first device work hasn't completed within a deadline, instead of
    letting the run hang silently forever.
"""

from __future__ import annotations

import subprocess
import sys
import threading

_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((128, 128)); "
    "print('PROBE_OK', float((x @ x).sum()))"
)


def probe_accelerator(timeout_s: float = 150.0) -> bool:
    """True iff a fresh subprocess completes one tiny dispatch on the
    DEFAULT backend within `timeout_s` (generous: import + first compile
    through a remote transport is tens of seconds when healthy)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "PROBE_OK" in r.stdout


def resolve_platform(platform: str, probe_timeout_s: float = 150.0) -> str:
    """Map the CLI --platform choice to a concrete jax platform pin.

    "cpu"   → "cpu" (unconditional pin);
    "auto"  → "" (leave JAX's default resolution alone);
    "probe" → "" if a subprocess dispatch completes on the default
              backend, else "cpu" with a stderr warning — the run
              degrades instead of hanging.
    """
    if platform == "cpu":
        return "cpu"
    if platform == "probe":
        if probe_accelerator(probe_timeout_s):
            return ""
        print(
            "dgcnn_tpu: accelerator probe FAILED (no dispatch completed "
            f"within {probe_timeout_s:.0f}s) — falling back to CPU. "
            "Rerun with --platform auto to force the accelerator.",
            file=sys.stderr,
            flush=True,
        )
        return "cpu"
    return ""


class DispatchWatchdog:
    """One-shot timer around the run's FIRST device work (dataset H2D /
    densify + first fused epoch program). If it hasn't completed within
    `seconds`, print an actionable stderr hint — the transport may be
    wedged (dispatches hang without error on remote-attached TPUs) or the
    first XLA compile pathologically slow. Diagnosis only: the run is
    left untouched, and nothing is printed on the healthy path."""

    def __init__(self, seconds: float, what: str = "first device work"):
        self._hint = (
            f"dgcnn_tpu: {what} still not finished after {seconds:.0f}s. "
            "If no progress appears, the accelerator transport may be "
            "unresponsive (it can hang without error) — consider rerunning "
            "with --platform probe (health-check first) or --platform cpu. "
            "First XLA compiles through a remote transport can also take "
            "several minutes; this is only a hint."
        )
        self._timer = threading.Timer(
            seconds, lambda: print(self._hint, file=sys.stderr, flush=True)
        )
        self._timer.daemon = True
        self._seconds = seconds

    def start(self) -> "DispatchWatchdog":
        if self._seconds > 0:
            self._timer.start()
        return self

    def cancel(self) -> None:
        self._timer.cancel()
