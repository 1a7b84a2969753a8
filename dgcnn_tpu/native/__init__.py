"""Native runtime components (C++ via ctypes).

`pack_epoch_native` is a drop-in accelerated backend for
`batching.packer.pack_epoch` (the COO host packing hot path — see
native/packer.cc for the layout contract). The shared library is built
on demand with g++; every call site degrades gracefully to the NumPy
implementation when no compiler/library is available
(`native_available()` gates dispatch).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cc")
_LIB = os.path.join(_HERE, "libdgcnn_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None

        i64, i32, f32 = (
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        )
        lib.dgcnn_pack_epoch_coo.restype = ctypes.c_int
        lib.dgcnn_pack_epoch_coo.argtypes = [
            f32, ctypes.c_int64,  # x, num_features
            i64, i32, i32, i64,  # node_ptr, edge_src, edge_dst, edge_ptr
            i32,  # y
            i64, ctypes.c_int64, ctypes.c_int64,  # order, num_order, batch
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # bucket
            f32, i32, i32, f32, i32, f32, i32, f32, i32,  # outputs
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def pack_epoch_native(dataset, order: np.ndarray, batch_size: int, bucket):
    """C++ epoch packer; same output as batching.packer.pack_epoch.
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from dgcnn_tpu.batching.packer import GraphBatch

    order = np.ascontiguousarray(order, dtype=np.int64)
    steps = -(-len(order) // batch_size)
    n_pad, e_pad, b_pad = bucket.num_nodes, bucket.num_edges, bucket.num_graphs
    F = dataset.num_features

    out = GraphBatch(
        x=np.empty((steps, n_pad, F), np.float32),
        edge_src=np.empty((steps, e_pad), np.int32),
        edge_dst=np.empty((steps, e_pad), np.int32),
        edge_mask=np.empty((steps, e_pad), np.float32),
        node_graph=np.empty((steps, n_pad), np.int32),
        node_mask=np.empty((steps, n_pad), np.float32),
        y=np.empty((steps, b_pad), np.int32),
        graph_mask=np.empty((steps, b_pad), np.float32),
        num_graphs=np.empty((steps,), np.int32),
    )
    rc = lib.dgcnn_pack_epoch_coo(
        np.ascontiguousarray(dataset.x, np.float32), F,
        np.ascontiguousarray(dataset.node_ptr, np.int64),
        np.ascontiguousarray(dataset.edge_src, np.int32),
        np.ascontiguousarray(dataset.edge_dst, np.int32),
        np.ascontiguousarray(dataset.edge_ptr, np.int64),
        np.ascontiguousarray(dataset.y, np.int32),
        order, len(order), batch_size,
        n_pad, e_pad, b_pad,
        out.x, out.edge_src, out.edge_dst, out.edge_mask,
        out.node_graph, out.node_mask, out.y, out.graph_mask, out.num_graphs,
    )
    if rc != 0:
        raise ValueError(
            f"native packer failed with code {rc} "
            f"(bucket too small for a batch: {bucket})"
        )
    return out
