"""Independent NumPy oracle for the DGCNN forward pass.

Implements the reference's semantics (reference model.py:26-45) the direct,
dense way — dense normalized adjacency per graph, explicit per-graph sort,
explicit sliding-window convolutions — with none of the padding/masking/
packing machinery of the framework under test. Golden-parity tests compare
framework activations against this at fp32 tolerance (SURVEY §4 items 1-2).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def gcn_layer_dense(x: np.ndarray, edges: np.ndarray, w: np.ndarray, b: np.ndarray):
    """One GCNConv on a single graph: X' = D̂^-1/2 (A+I) D̂^-1/2 X W + b.

    `edges` is [E, 2] (src, dst), already self-loop-free; A is built as given
    (directed counts), matching PyG's scatter over the dst column."""
    n = x.shape[0]
    a = np.zeros((n, n), dtype=np.float64)
    for s, d in edges:
        a[d, s] += 1.0  # row = destination, col = source
    a += np.eye(n)
    deg = a.sum(axis=1)  # in-degree + self-loop
    dinv = 1.0 / np.sqrt(deg)
    norm = a * dinv[:, None] * dinv[None, :]
    return norm @ (x.astype(np.float64) @ w.astype(np.float64)) + b.astype(np.float64)


def sort_pool_single(x: np.ndarray, k: int) -> np.ndarray:
    """Per-graph SortPooling: stable sort rows descending by last channel,
    truncate/zero-pad to k rows (reference model.py:17,35)."""
    key = x[:, -1]
    # stable descending: sort by -key with stable mergesort keeps tie order
    order = np.argsort(-key, kind="stable")
    top = x[order[:k]]
    if top.shape[0] < k:
        top = np.concatenate(
            [top, np.zeros((k - top.shape[0], x.shape[1]), x.dtype)], axis=0
        )
    return top


def conv1d(x: np.ndarray, w: np.ndarray, b: np.ndarray, stride: int) -> np.ndarray:
    """torch.nn.Conv1d semantics on [C_in, L] with weight [C_out, C_in, K]."""
    c_out, c_in, kw = w.shape
    l_out = (x.shape[1] - kw) // stride + 1
    out = np.zeros((c_out, l_out))
    for o in range(c_out):
        for t in range(l_out):
            out[o, t] = (x[:, t * stride : t * stride + kw] * w[o]).sum() + b[o]
    return out


def maxpool1d(x: np.ndarray, size: int, stride: int) -> np.ndarray:
    l_out = (x.shape[1] - size) // stride + 1
    out = np.zeros((x.shape[0], l_out))
    for t in range(l_out):
        out[:, t] = x[:, t * stride : t * stride + size].max(axis=1)
    return out


def log_softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=-1, keepdims=True)
    return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))


def dgcnn_forward(
    params: Dict,
    graphs: List[Dict],
    k: int = 30,
) -> Dict[str, np.ndarray]:
    """Full-batch forward. `graphs` is a list of dicts with keys
    x [n, F] and edges [e, 2] (self-loop-free, graph-local).

    `params` uses the framework's layout:
      gcn: list of {w [in,out], b}, conv5 {w [C,c5], b}, conv6 {w [K,c5,c6], b},
      lin1/lin2 {w [in,out], b}. Time-major flatten (framework layout).
    Returns per-stage activations concatenated over graphs.
    """
    gcn_outs = [[] for _ in params["gcn"]]
    pooled_all, logits_all = [], []

    for g in graphs:
        x = g["x"].astype(np.float64)
        outs = []
        for li, layer in enumerate(params["gcn"]):
            x = np.tanh(gcn_layer_dense(x, g["edges"], layer["w"], layer["b"]))
            outs.append(x)
            gcn_outs[li].append(x)
        cat = np.concatenate(outs, axis=1)
        pooled = sort_pool_single(cat, k)  # [k, C]
        pooled_all.append(pooled)

        # conv5: kernel=stride=C on the flattened row == per-row dot product
        h = pooled @ params["conv5"]["w"] + params["conv5"]["b"]  # [k, c5]
        h = np.maximum(h, 0.0)
        # maxpool(2,2) over the k axis, then conv6 (width K) channels-last
        h = maxpool1d(h.T, 2, 2)  # [c5, k//2]
        w6 = params["conv6"]["w"]  # [K, c5, c6]
        h = conv1d(h, np.transpose(w6, (2, 1, 0)), params["conv6"]["b"], 1)  # [c6, T]
        h = np.maximum(h, 0.0)
        flat = h.T.reshape(-1)  # time-major flatten (framework layout)

        z = np.maximum(flat @ params["lin1"]["w"] + params["lin1"]["b"], 0.0)
        z = z @ params["lin2"]["w"] + params["lin2"]["b"]
        logits_all.append(log_softmax(z[None, :])[0])

    return {
        **{
            f"gcn{i + 1}": np.concatenate(outs, axis=0)
            for i, outs in enumerate(gcn_outs)
        },
        "sort_pool": np.stack(pooled_all, axis=0),
        "log_probs": np.stack(logits_all, axis=0),
    }
