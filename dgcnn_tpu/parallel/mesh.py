"""Device-mesh construction.

The reference has no distributed layer at all (single device selected at
reference train.py:75-79; SURVEY §2e). This module is new, TPU-native
surface: a named 2-D mesh with axes

    "data"  — data parallelism over independent graph mega-batches
    "graph" — edge partitioning *within* a mega-batch: each device owns a
              slice of the batch adjacency and exchanges partial node
              aggregates via psum over ICI (SURVEY §2e items 1-2)

Multi-host entry is `jax.distributed.initialize()` (call before device
queries on pods); single-process multi-device and the CPU
`--xla_force_host_platform_device_count` test mesh go through the same
`make_mesh`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def device_grid(shape: Tuple[int, int], devices: Optional[Sequence] = None) -> np.ndarray:
    devs = list(devices) if devices is not None else jax.devices()
    n = shape[0] * shape[1]
    if n > len(devs):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devs)}")
    return np.array(devs[:n]).reshape(shape)


def make_mesh(
    shape: Tuple[int, int] = (1, 1),
    axis_names: Tuple[str, str] = ("data", "graph"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ("data", "graph") mesh over the first shape[0]*shape[1] devices."""
    return Mesh(device_grid(shape, devices), axis_names)


def initialize_multihost(**kwargs) -> None:
    """Multi-host runtime bring-up (SURVEY §2e item 3). No-op when already
    initialized; every other failure propagates — silently swallowing a
    bad-coordinator error would let each host train an independent
    replica with no warning."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise
