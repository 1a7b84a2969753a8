"""Weight conversion between this framework's param pytree and the
reference PyTorch model's state_dict (reference model.py:13-23).

Pure NumPy — usable both here (no torch_geometric installed) and inside a
pinned-PyG environment (parity/pyg_dump.py).

Key layout differences handled:
  * torch Linear/PyG-Linear weights are [out, in]; ours are [in, out];
  * conv5 `Conv1d(1, c5, C, C)` is our per-node matmul `w5 [C, c5]`
    (ops/readout.py) — torch weight [c5, 1, C];
  * conv6 `Conv1d(c5, c6, K)` torch [c6, c5, K] ↔ ours 'HIO' [K, c5, c6];
  * the readout flatten: torch flattens [B, c6, T] channel-major
    (reference model.py:40), ours flattens [B, T, c6] time-major
    (ops/readout.py docstring) — a fixed row permutation of
    `classifier_1.weight`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _flatten_perm(t_len: int, c6: int) -> np.ndarray:
    """perm[ours_row] = torch_column: ours index t*c6+c ↔ torch c*T+t."""
    t_idx, c_idx = np.meshgrid(np.arange(t_len), np.arange(c6), indexing="ij")
    return (c_idx * t_len + t_idx).reshape(-1)


def params_to_torch_state(params, model) -> Dict[str, np.ndarray]:
    """Framework params → reference `Model.state_dict()` arrays (NumPy)."""
    state: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["gcn"], start=1):
        state[f"conv{i}.lin.weight"] = np.asarray(layer["w"]).T
        state[f"conv{i}.bias"] = np.asarray(layer["b"])

    w5 = np.asarray(params["conv5"]["w"])  # [C, c5]
    state["conv5.weight"] = w5.T[:, None, :]  # [c5, 1, C]
    state["conv5.bias"] = np.asarray(params["conv5"]["b"])

    w6 = np.asarray(params["conv6"]["w"])  # [K, c5, c6]
    state["conv6.weight"] = np.transpose(w6, (2, 1, 0))  # [c6, c5, K]
    state["conv6.bias"] = np.asarray(params["conv6"]["b"])

    t_len = model.sort_pool_k // 2 - model.conv1d_kernel + 1
    c6 = model.conv1d_channels[1]
    perm = _flatten_perm(t_len, c6)
    lin1 = np.asarray(params["lin1"]["w"])  # [flat(ours), dense]
    torch_w1 = np.empty_like(lin1.T)  # [dense, flat(torch)]
    torch_w1[:, perm] = lin1.T[:, np.arange(len(perm))]
    state["classifier_1.weight"] = torch_w1
    state["classifier_1.bias"] = np.asarray(params["lin1"]["b"])

    state["classifier_2.weight"] = np.asarray(params["lin2"]["w"]).T
    state["classifier_2.bias"] = np.asarray(params["lin2"]["b"])
    return state


def torch_state_to_params(state: Dict[str, np.ndarray], model):
    """Reference `Model.state_dict()` arrays → framework params pytree."""
    import jax.numpy as jnp

    gcn = []
    i = 1
    while f"conv{i}.lin.weight" in state and i <= len(model.hidden_dims):
        gcn.append(
            {
                "w": jnp.asarray(np.asarray(state[f"conv{i}.lin.weight"]).T),
                "b": jnp.asarray(np.asarray(state[f"conv{i}.bias"])),
            }
        )
        i += 1

    w5 = np.asarray(state["conv5.weight"])[:, 0, :].T  # [C, c5]
    w6 = np.transpose(np.asarray(state["conv6.weight"]), (2, 1, 0))  # [K, c5, c6]

    t_len = model.sort_pool_k // 2 - model.conv1d_kernel + 1
    c6 = model.conv1d_channels[1]
    perm = _flatten_perm(t_len, c6)
    torch_w1 = np.asarray(state["classifier_1.weight"])  # [dense, flat(torch)]
    lin1 = torch_w1[:, perm].T  # [flat(ours), dense]

    return {
        "gcn": gcn,
        "conv5": {"w": jnp.asarray(w5), "b": jnp.asarray(np.asarray(state["conv5.bias"]))},
        "conv6": {"w": jnp.asarray(w6), "b": jnp.asarray(np.asarray(state["conv6.bias"]))},
        "lin1": {
            "w": jnp.asarray(lin1),
            "b": jnp.asarray(np.asarray(state["classifier_1.bias"])),
        },
        "lin2": {
            "w": jnp.asarray(np.asarray(state["classifier_2.weight"]).T),
            "b": jnp.asarray(np.asarray(state["classifier_2.bias"])),
        },
    }
