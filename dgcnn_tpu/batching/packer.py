"""Pad-and-bucket ragged batcher.

TPU-native replacement for PyG's `DataLoader`/`Batch.from_data_list`
(reference train.py:108-109): instead of collating graphs into a
dynamic-shape mega-graph per batch, we pack up to `batch_size` graphs into
*fixed* (num_nodes, num_edges, num_graphs) buckets with explicit masks, so
XLA compiles each bucket shape exactly once and `lax.scan` can iterate a
whole epoch on device.

Additional invariants established here (so the jitted model never needs
dynamic work):
  * self-loops are stripped once at pack time (replaces the per-forward
    `remove_self_loops` at reference model.py:28);
  * edges are sorted by destination node — a CSR-like ordering that the
    Pallas SpMM kernel (kernels/spmm_pallas.py) exploits for contiguous
    per-destination accumulation;
  * padded nodes carry graph id `num_graph_slots` (one past the last real
    slot) so segment ops and SortPooling can exclude them with static
    shapes only;
  * padded edges carry edge_mask 0 and point at the LAST node slot
    (src 0 → dst N_pad−1), so the destination column stays globally
    sorted — `indices_are_sorted` reductions and the Pallas kernel's
    CSR row ranges remain valid — while contributing exactly 0 (their
    GCN edge weights are masked on device).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from dgcnn_tpu.data.graphset import GraphSet


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """Static shapes of a packed batch."""

    num_nodes: int  # N_pad
    num_edges: int  # E_pad
    num_graphs: int  # B_pad (graph slots)


@dataclasses.dataclass
class GraphBatch:
    """One packed mega-batch. All arrays have static, bucket-determined
    shapes; a pytree of NumPy (host) or jnp (device) arrays.

    x:           [N_pad, F]   node features (zeros in padding)
    edge_src:    [E_pad]      batch-global source node index (0 in padding)
    edge_dst:    [E_pad]      batch-global destination node index, sorted
    edge_mask:   [E_pad]      1.0 for real edges
    node_graph:  [N_pad]      graph slot of each node; == B_pad in padding
    node_mask:   [N_pad]      1.0 for real nodes
    y:           [B_pad]      labels (0 in padding)
    graph_mask:  [B_pad]      1.0 for real graphs
    num_graphs:  []           scalar count of real graphs in this batch
    """

    x: np.ndarray
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_mask: np.ndarray
    node_graph: np.ndarray
    node_mask: np.ndarray
    y: np.ndarray
    graph_mask: np.ndarray
    num_graphs: np.ndarray
    # optional block-pair SpMM structure (kernels/spmm_block_coo.py), a
    # (BlockCOO, w_pad, w_padT) tuple attached by `add_blockcoo` — lets
    # spmm_impl auto/pallas route GCN aggregation to the block-COO Pallas
    # kernel; None on paths that don't build it (a None pytree child is
    # an empty subtree, so stacking/scanning is unaffected)
    blockcoo: object = None


def _tree_flatten(batch: GraphBatch):
    children = tuple(getattr(batch, f.name) for f in dataclasses.fields(GraphBatch))
    return children, None


def _tree_unflatten(aux, children):
    return GraphBatch(*children)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(GraphBatch, _tree_flatten, _tree_unflatten)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compute_bucket(
    dataset: GraphSet,
    batch_size: int,
    node_multiple: int = 256,
    edge_multiple: int = 1024,
    graph_multiple: int = 8,
) -> BucketSpec:
    """Worst-case bucket for shuffled batches of `batch_size` graphs: the sum
    of the `batch_size` largest node/edge counts, rounded up. Guarantees any
    batch composition fits, so one XLA compilation covers the whole run."""
    nc = np.sort(dataset.node_counts())[::-1]
    ec = np.sort(dataset.edge_counts())[::-1]
    k = min(batch_size, len(nc))
    n_max = int(nc[:k].sum())
    e_max = int(ec[:k].sum())
    return BucketSpec(
        num_nodes=_round_up(max(n_max, 1), node_multiple),
        num_edges=_round_up(max(e_max, 1), edge_multiple),
        num_graphs=_round_up(batch_size, graph_multiple),
    )


def pack_batch(
    dataset: GraphSet, graph_indices: Sequence[int], bucket: BucketSpec
) -> GraphBatch:
    """Pack the given graphs into one fixed-shape GraphBatch."""
    idx = np.asarray(graph_indices, dtype=np.int64)
    b = len(idx)
    if b > bucket.num_graphs:
        raise ValueError(f"{b} graphs > bucket.num_graphs={bucket.num_graphs}")

    n_counts = dataset.node_counts()[idx]
    n_tot = int(n_counts.sum())
    if n_tot > bucket.num_nodes:
        raise ValueError(f"{n_tot} nodes > bucket.num_nodes={bucket.num_nodes}")

    F = dataset.num_features
    x = np.zeros((bucket.num_nodes, F), dtype=np.float32)
    node_graph = np.full(bucket.num_nodes, bucket.num_graphs, dtype=np.int32)
    node_mask = np.zeros(bucket.num_nodes, dtype=np.float32)
    y = np.zeros(bucket.num_graphs, dtype=np.int32)
    graph_mask = np.zeros(bucket.num_graphs, dtype=np.float32)

    node_off = np.zeros(b + 1, dtype=np.int64)
    np.cumsum(n_counts, out=node_off[1:])

    srcs: List[np.ndarray] = []
    dsts: List[np.ndarray] = []
    for j, g in enumerate(idx):
        ns, ne = dataset.node_ptr[g], dataset.node_ptr[g + 1]
        x[node_off[j] : node_off[j + 1]] = dataset.x[ns:ne]
        node_graph[node_off[j] : node_off[j + 1]] = j
        es, ee = dataset.edge_ptr[g], dataset.edge_ptr[g + 1]
        s = dataset.edge_src[es:ee].astype(np.int64)
        d = dataset.edge_dst[es:ee].astype(np.int64)
        keep = s != d  # strip self-loops once (reference model.py:28)
        srcs.append(s[keep] + node_off[j])
        dsts.append(d[keep] + node_off[j])
    node_mask[:n_tot] = 1.0
    y[:b] = dataset.y[idx]
    graph_mask[:b] = 1.0

    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    e_tot = len(src)
    if e_tot > bucket.num_edges:
        raise ValueError(f"{e_tot} edges > bucket.num_edges={bucket.num_edges}")

    # CSR-like destination ordering for the Pallas SpMM.
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]

    edge_src = np.zeros(bucket.num_edges, dtype=np.int32)
    edge_dst = np.full(bucket.num_edges, bucket.num_nodes - 1, dtype=np.int32)
    edge_mask = np.zeros(bucket.num_edges, dtype=np.float32)
    edge_src[:e_tot] = src
    edge_dst[:e_tot] = dst
    edge_mask[:e_tot] = 1.0

    return GraphBatch(
        x=x,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_mask=edge_mask,
        node_graph=node_graph,
        node_mask=node_mask,
        y=y,
        graph_mask=graph_mask,
        num_graphs=np.asarray(b, dtype=np.int32),
    )


def blockcoo_item_bound(
    dataset: GraphSet, batch_size: int, eb: int = 0
) -> int:
    """Static per-batch work-item bound for `add_blockcoo` structures —
    the worst-case batch composition (the `batch_size` largest graphs,
    mirroring compute_bucket). Contiguously-packed graphs span
    `n//128 + 2` consecutive node blocks, so each contributes at most
    ~3·span (r, c) groups (|r−c| ≤ span bands) plus its own EB chunking.
    Loose but SHAPE-STABLE: every epoch pads to it, so fused multi-epoch
    stacks share one compiled program. add_blockcoo still grows past it
    when an actual epoch exceeds the bound (correct, at a retrace)."""
    from dgcnn_tpu.kernels.spmm_block_coo import BS, DEFAULT_EB

    eb = eb or DEFAULT_EB
    nc = np.sort(dataset.node_counts())[::-1][:batch_size]
    ec = np.sort(dataset.edge_counts())[::-1][:batch_size]
    span = nc // BS + 2
    groups = np.minimum(3 * span, np.maximum(ec, 1))
    items = groups + ec // eb
    return int(items.sum()) + 8


def add_blockcoo(
    batch: GraphBatch, eb: int = 0, pad_items_to: int = 0
) -> GraphBatch:
    """Attach the block-pair SpMM structure (kernels/spmm_block_coo.py) to
    a packed batch OR a stacked epoch of batches — a host post-pass over
    the already-packed edge arrays, so it composes with both the NumPy and
    the native C++ packer backends.

    For a stacked epoch, every batch's item axis is padded to the epoch
    max (sentinel items are never read) so the structures stack into one
    scanned pytree. Weights are the batches' edge masks (the GCN
    symmetric norm runs as node-row scalings OUTSIDE the spmm —
    ops/gcn.py node_scale — so mask weights are exactly what the
    aggregation consumes)."""
    import jax.numpy as jnp

    from dgcnn_tpu.kernels.spmm_block_coo import (
        DEFAULT_EB,
        build_block_coo,
        pad_weights,
        pad_weights_t,
    )

    eb = eb or DEFAULT_EB
    stacked = batch.edge_src.ndim == 2
    srcs = batch.edge_src if stacked else batch.edge_src[None]
    dsts = batch.edge_dst if stacked else batch.edge_dst[None]
    masks = batch.edge_mask if stacked else batch.edge_mask[None]
    n_pad = batch.x.shape[-2]

    per_batch = []
    for src, dst, mask in zip(np.asarray(srcs), np.asarray(dsts), np.asarray(masks)):
        real = mask > 0
        per_batch.append((src[real], dst[real], mask[real]))

    from dgcnn_tpu.kernels.spmm_block_coo import pad_structure

    raw = [build_block_coo(src, dst, n_pad, eb=eb) for src, dst, _ in per_batch]
    w_max = max(
        max(s.ls.shape[0] for s in raw),
        max(s.lsT.shape[0] for s in raw),
        pad_items_to,
    )
    structs, wps, wpTs = [], [], []
    for s, (_, _, mask) in zip(raw, per_batch):
        s = pad_structure(s, w_max)
        structs.append(s)
        wps.append(pad_weights(s, mask))
        wpTs.append(pad_weights_t(s, mask))

    # canonical meta: per-epoch values (edge count, fill) are STATIC pytree
    # fields, so leaving them batch-dependent would retrace — or fail to
    # stack — every fused epoch (BlockCOOMeta docstring). Engine use is an
    # explicit --spmm pallas opt-in, which the dispatcher honors without a
    # fill gate (ops/spmm.py), so the sentinels lose nothing.
    meta = dataclasses.replace(structs[0].meta, num_edges=-1, fill=-1.0)

    def cat(field):
        arrs = [np.asarray(getattr(s, field)) for s in structs]
        out = np.stack(arrs, axis=0)
        return jnp.asarray(out if stacked else out[0])

    from dgcnn_tpu.kernels.spmm_block_coo import BlockCOO

    structure = BlockCOO(
        meta=meta,
        row_ptr=cat("row_ptr"), item_r=cat("item_r"), item_c=cat("item_c"),
        ls=cat("ls"), ld=cat("ld"), perm=cat("perm"),
        row_ptrT=cat("row_ptrT"), item_cT=cat("item_cT"),
        lsT=cat("lsT"), ldT=cat("ldT"), permT=cat("permT"),
    )
    w_pad = np.stack(wps, axis=0)
    w_padT = np.stack(wpTs, axis=0)
    if not stacked:
        w_pad, w_padT = w_pad[0], w_padT[0]
    return dataclasses.replace(
        batch, blockcoo=(structure, jnp.asarray(w_pad), jnp.asarray(w_padT))
    )


def pack_epoch(
    dataset: GraphSet,
    order: np.ndarray,
    batch_size: int,
    bucket: BucketSpec,
    backend: str = "auto",
) -> GraphBatch:
    """Pack an epoch's worth of batches, stacked on a leading axis for
    `lax.scan`. `order` is the (possibly shuffled) sequence of graph indices;
    batches are consecutive slices of `batch_size`, with the final ragged
    batch padded — mirroring the reference loader's batch composition
    (reference train.py:108-109, drop_last=False).

    `backend`: "native" = C++ packer (native/packer.cc), "numpy" = this
    module, "auto" = native when buildable, identical output either way."""
    order = np.asarray(order, dtype=np.int64)
    if backend in ("auto", "native"):
        from dgcnn_tpu import native

        out = native.pack_epoch_native(dataset, order, batch_size, bucket)
        if out is not None:
            return out
        if backend == "native":
            raise RuntimeError("native packer requested but unavailable")
    batches = [
        pack_batch(dataset, order[i : i + batch_size], bucket)
        for i in range(0, len(order), batch_size)
    ]
    return _jtu.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)
