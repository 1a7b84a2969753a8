"""Dense block-diagonal batch layout — the MXU path.

The COO gather/scatter SpMM (ops/spmm.py, kernels/spmm_pallas.py) is
latency-bound on TPU: random row access has no hardware gather, so both the
XLA and Pallas paths pay tens of cycles per edge. But the DGCNN benchmark
graphs are SMALL (≤ a few hundred nodes), so the TPU-native layout is the
per-graph *dense* normalized adjacency: a batch becomes

    x    [B, n_tile, F]      per-graph node features (zero padded)
    adj  [B, n_tile, n_tile] D̂^{-1/2}(A+I)D̂^{-1/2}, precomputed on host
                             (it depends only on the graph, never on params)

and one GCN propagation is a single batched matmul `adj @ (x @ W)` that
runs on the MXU at full tilt — no segment ids, no masks in the hot loop,
no scatter. SortPooling reduces to a per-graph `lax.top_k`.

This layout is quadratic in the largest graph of the dataset, so the
dispatcher (train/cv.py) uses it when `max_nodes ≤ dense_max_nodes` and
falls back to the COO path (D&D's 5.7k-node outliers) otherwise. Exact
same semantics — test_dense.py proves logit equality against the COO path.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax.tree_util as jtu

from dgcnn_tpu.data.graphset import GraphSet


@dataclasses.dataclass
class DenseGraphBatch:
    """One dense-layout batch (host numpy or device jnp pytree)."""

    x: np.ndarray  # [B, n_tile, F]
    adj: np.ndarray  # [B, n_tile, n_tile] normalized, self-loops included
    node_mask: np.ndarray  # [B, n_tile]
    y: np.ndarray  # [B]
    graph_mask: np.ndarray  # [B]
    num_graphs: np.ndarray  # []


def _tree_flatten(b: DenseGraphBatch):
    return tuple(getattr(b, f.name) for f in dataclasses.fields(DenseGraphBatch)), None


jtu.register_pytree_node(
    DenseGraphBatch, _tree_flatten, lambda aux, ch: DenseGraphBatch(*ch)
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dense_tile(dataset: GraphSet, multiple: int = 8) -> int:
    """n_tile = dataset max graph size rounded up (sublane-aligned)."""
    return _round_up(int(dataset.node_counts().max()), multiple)


def pack_dense_batch(
    dataset: GraphSet,
    graph_indices: Sequence[int],
    n_tile: int,
    num_graph_slots: int,
) -> DenseGraphBatch:
    """Pack graphs into the dense layout with the GCN-normalized adjacency
    precomputed (self-loops re-added per PyG GCNConv defaults after input
    self-loops were stripped — reference model.py:28 + SURVEY §2c row 1)."""
    idx = np.asarray(graph_indices, dtype=np.int64)
    b = len(idx)
    if b > num_graph_slots:
        raise ValueError(f"{b} graphs > {num_graph_slots} slots")
    F = dataset.num_features

    x = np.zeros((num_graph_slots, n_tile, F), dtype=np.float32)
    adj = np.zeros((num_graph_slots, n_tile, n_tile), dtype=np.float32)
    node_mask = np.zeros((num_graph_slots, n_tile), dtype=np.float32)
    y = np.zeros(num_graph_slots, dtype=np.int32)
    graph_mask = np.zeros(num_graph_slots, dtype=np.float32)

    for j, g in enumerate(idx):
        ns, ne = dataset.node_ptr[g], dataset.node_ptr[g + 1]
        n = ne - ns
        if n > n_tile:
            raise ValueError(f"graph {g} has {n} nodes > n_tile={n_tile}")
        x[j, :n] = dataset.x[ns:ne]
        node_mask[j, :n] = 1.0

        es, ee = dataset.edge_ptr[g], dataset.edge_ptr[g + 1]
        s = dataset.edge_src[es:ee]
        d = dataset.edge_dst[es:ee]
        keep = s != d  # strip input self-loops (reference model.py:28)
        a = adj[j]
        np.add.at(a, (d[keep], s[keep]), 1.0)
        a[np.arange(n), np.arange(n)] += 1.0  # re-added self-loops
        deg = a[:n, :n].sum(axis=1)
        dinv = 1.0 / np.sqrt(deg)
        a[:n, :n] *= dinv[:, None] * dinv[None, :]

    y[:b] = dataset.y[idx]
    graph_mask[:b] = 1.0
    return DenseGraphBatch(
        x=x,
        adj=adj,
        node_mask=node_mask,
        y=y,
        graph_mask=graph_mask,
        num_graphs=np.asarray(b, dtype=np.int32),
    )


def pack_dense_epoch(
    dataset: GraphSet,
    order: np.ndarray,
    batch_size: int,
    n_tile: int,
    num_graph_slots: int,
) -> DenseGraphBatch:
    """Stack an epoch of dense batches on a scan axis."""
    order = np.asarray(order, dtype=np.int64)
    batches = [
        pack_dense_batch(dataset, order[i : i + batch_size], n_tile, num_graph_slots)
        for i in range(0, len(order), batch_size)
    ]
    return jtu.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)


def dense_epoch_bytes(dataset: GraphSet, batch_size: int, n_tile: int,
                      num_graph_slots: int) -> int:
    """Estimated device bytes for a stacked dense epoch (adjacency dominates)."""
    steps = -(-dataset.num_graphs // batch_size)
    per_batch = num_graph_slots * n_tile * (n_tile + dataset.num_features + 1) * 4
    return steps * per_batch


# -- device-resident dense dataset ------------------------------------------
#
# The normalized adjacency of a graph never changes across epochs or folds,
# so the whole dataset is materialized in dense form ONCE, moved to HBM, and
# an epoch's batches are built *on device* by gathering graph rows with the
# epoch's shuffled index matrix — the only per-epoch host→device transfer is
# that [steps, batch_slots] int32 matrix. This removes host packing (seconds
# per epoch) from the training path entirely.


@dataclasses.dataclass
class DenseDataset:
    """All graphs of a dataset in dense form (device pytree after
    jax.device_put). Row g holds graph g; gather with an index vector to
    form a batch."""

    x: np.ndarray  # [G, n_tile, F]
    adj: np.ndarray  # [G, n_tile, n_tile]
    node_mask: np.ndarray  # [G, n_tile]
    y: np.ndarray  # [G]


jtu.register_pytree_node(
    DenseDataset,
    lambda d: ((d.x, d.adj, d.node_mask, d.y), None),
    lambda aux, ch: DenseDataset(*ch),
)


def build_dense_dataset(dataset: GraphSet, n_tile: int) -> DenseDataset:
    """One-time dense materialization of every graph (host side).
    Prefer `build_dense_dataset_on_device` for device-resident use — it
    ships O(nodes+edges) instead of O(G·n_tile²) over the link."""
    g = dataset.num_graphs
    batch = pack_dense_batch(dataset, np.arange(g), n_tile, g)
    return DenseDataset(
        x=batch.x, adj=batch.adj, node_mask=batch.node_mask, y=batch.y
    )


def build_dense_dataset_on_device(
    dataset: GraphSet, n_tile: int, adj_dtype=None
) -> DenseDataset:
    """Device-resident dense materialization: transfer the compact COO
    graphset, densify in HBM (batching/device_coo.py densify_on_device).
    `adj_dtype` (Config.adj_dtype, resolved) is the adjacency STORAGE
    dtype — bf16 halves the dominant HBM array at zero MXU-precision cost
    (see config.py)."""
    import jax

    from dgcnn_tpu.batching.device_coo import (
        build_device_graphset,
        densify_on_device,
    )

    dev = jax.device_put(build_device_graphset(dataset))
    return densify_on_device(dev, n_tile, adj_dtype=adj_dtype)


def dense_dataset_bytes(
    dataset: GraphSet, n_tile: int, adj_bytes: int = 4
) -> int:
    """Device-resident footprint of the dense layout. `adj_bytes` is the
    per-element width of the adjacency (the G·n_tile² dominant term):
    2 when Config.adj_dtype resolves to bfloat16, 4 for fp32 — the
    layout=auto HBM gate must not reject a bf16 config whose dense form
    fits just because its fp32 estimate would not."""
    g, f = dataset.num_graphs, dataset.num_features
    return g * n_tile * (n_tile * adj_bytes + (f + 1) * 4)


def order_matrix(order: np.ndarray, batch_size: int, batch_slots: int) -> np.ndarray:
    """Epoch index matrix [steps, batch_slots]; −1 marks padded slots.
    Batches are consecutive `batch_size` slices of `order`, like the
    reference loader (train.py:108-109)."""
    order = np.asarray(order, dtype=np.int32)
    steps = -(-len(order) // batch_size)
    out = np.full((steps, batch_slots), -1, dtype=np.int32)
    for s in range(steps):
        chunk = order[s * batch_size : (s + 1) * batch_size]
        out[s, : len(chunk)] = chunk
    return out


def order_matrix_dp(
    order: np.ndarray, batch_size: int, n_data: int, slots_local: int
) -> np.ndarray:
    """Epoch index tensor [steps, n_data, slots_local] for data-parallel
    dense training: each global batch's graphs are dealt round-robin to the
    data-axis devices (dense compute cost per graph is constant — n_tile²
    — so count balance is node balance)."""
    order = np.asarray(order, dtype=np.int32)
    steps = -(-len(order) // batch_size)
    out = np.full((steps, n_data, slots_local), -1, dtype=np.int32)
    for s in range(steps):
        chunk = order[s * batch_size : (s + 1) * batch_size]
        for d in range(n_data):
            mine = chunk[d::n_data]
            out[s, d, : len(mine)] = mine
    return out


def gather_dense_batch(data: DenseDataset, idx) -> DenseGraphBatch:
    """Device-side batch construction: gather graph rows by index (−1 →
    masked padding slot). Traced inside the jitted epoch."""
    import jax.numpy as jnp

    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    gm = valid.astype(jnp.float32)
    return DenseGraphBatch(
        x=data.x[safe],
        adj=data.adj[safe],
        node_mask=data.node_mask[safe] * gm[:, None],
        y=data.y[safe] * valid.astype(data.y.dtype),
        graph_mask=gm,
        num_graphs=gm.sum().astype(jnp.int32),
    )
