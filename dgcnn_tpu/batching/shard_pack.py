"""Node-sharded batch packing for HALO edge partitioning (SURVEY §2e
item 2, the stated design: each graph-axis device owns a NODE SHARD, and
boundary-node features move as neighbor exchanges instead of full-array
all-reduces).

Round 1 shipped edge partitioning as replicated-nodes + per-layer psum —
exact, but per-device memory does not drop with the graph axis and every
layer all-reduces the full [N_pad, F] block. This layout fixes both:

  * the packed node axis is split into G contiguous shards of S rows;
    per-device arrays are 1/G the size;
  * graphs are packed contiguously, so an edge's endpoints are at most
    one graph-span apart — any cross-shard edge reaches only the ADJACENT
    shard. A halo of H rows (H ≥ max nodes per graph, a bucket constant)
    on each side makes every edge locally resolvable after ONE neighbor
    exchange (two `ppermute`s) per layer: O(H·F) moved instead of the
    psum's O(N_pad·F);
  * each graph is OWNED by the shard holding its first node; the owner
    sees the whole graph inside its extended [H | S | H] row window, so
    SortPooling, readout and loss run shard-locally on owned graphs.

Index conventions per shard g (all static shapes):
  local rows    = global rows [g·S, (g+1)·S)
  extended rows = global [g·S − H, (g+1)·S + H), local coordinate
                  ext = global − g·S + H  ∈ [0, S + 2H)
  edge_dst_loc  ∈ [0, S)        (dst-partitioned: owner shard of dst)
  edge_src_ext  ∈ [0, S + 2H)   (always valid: |src−dst| < H)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from dgcnn_tpu.data.graphset import GraphSet


@dataclasses.dataclass
class HaloBatch:
    """One packed batch, node-sharded over the mesh "graph" axis with
    halo-resolvable edges. Leading axis = shard (length G); shard_map
    splits it. All shapes static per bucket.

    x:              [G, S, F]      node features (zeros in padding)
    edge_src_ext:   [G, E_s]       source, EXTENDED local coords
    edge_dst_loc:   [G, E_s]       destination, local coords, sorted
    edge_mask:      [G, E_s]
    node_mask:      [G, S]
    node_graph_ext: [G, S+2H]      local slot of the row's graph IF this
                                   shard owns it, else B_s (pool mask)
    y:              [G, B_s]
    graph_mask:     [G, B_s]
    num_graphs:     [G]            owned-graph count per shard
    halo:           int (static)
    """

    x: np.ndarray
    edge_src_ext: np.ndarray
    edge_dst_loc: np.ndarray
    edge_mask: np.ndarray
    node_mask: np.ndarray
    node_graph_ext: np.ndarray
    y: np.ndarray
    graph_mask: np.ndarray
    num_graphs: np.ndarray
    halo: int = 0


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_dataclass(
    HaloBatch,
    data_fields=[
        "x", "edge_src_ext", "edge_dst_loc", "edge_mask", "node_mask",
        "node_graph_ext", "y", "graph_mask", "num_graphs",
    ],
    meta_fields=["halo"],
)


def halo_width(dataset: GraphSet, multiple: int = 64) -> int:
    """Bucket halo: the largest graph's node count rounded up — the bound
    that keeps every graph inside its owner's extended window and every
    edge within one neighbor exchange."""
    m = int(dataset.node_counts().max())
    return -(-m // multiple) * multiple


def pack_batch_halo(
    dataset: GraphSet,
    graph_indices: Sequence[int],
    n_shards: int,
    shard_nodes: int,
    shard_edges: int,
    shard_graphs: int,
    halo: int,
) -> HaloBatch:
    """Pack graphs contiguously into G node shards of `shard_nodes` rows.

    Self-loops are stripped (reference model.py:28) and per-shard edges
    are destination-sorted, exactly like batching/packer.py."""
    idx = np.asarray(graph_indices, dtype=np.int64)
    g_count = n_shards
    s = shard_nodes
    h = halo
    f = dataset.num_features

    n_counts = dataset.node_counts()[idx]
    if int(n_counts.max(initial=0)) > h:
        raise ValueError(
            f"graph with {int(n_counts.max())} nodes exceeds halo {h}"
        )
    total = int(n_counts.sum())
    if total > g_count * s:
        raise ValueError(f"{total} nodes > {g_count}×{s} shard budget")

    x = np.zeros((g_count, s, f), np.float32)
    node_mask = np.zeros((g_count, s), np.float32)
    node_graph_ext = np.full((g_count, s + 2 * h), shard_graphs, np.int32)
    y = np.zeros((g_count, shard_graphs), np.int32)
    graph_mask = np.zeros((g_count, shard_graphs), np.float32)
    num_graphs = np.zeros(g_count, np.int32)
    edges = [[] for _ in range(g_count)]  # (src_ext, dst_loc) per shard

    offset = 0  # global packed node offset
    slot_of_shard = np.zeros(g_count, np.int64)
    for g in idx:
        ns, ne = dataset.node_ptr[g], dataset.node_ptr[g + 1]
        gn = int(ne - ns)
        owner = offset // s
        # the owner must see the whole graph inside its extended window
        if offset + gn > (owner + 1) * s + h:
            raise ValueError(
                f"graph of {gn} nodes at offset {offset} escapes shard "
                f"{owner}'s window (S={s}, H={h})"
            )
        slot = int(slot_of_shard[owner])
        if slot >= shard_graphs:
            raise ValueError(f"shard {owner} exceeds {shard_graphs} slots")
        slot_of_shard[owner] += 1
        y[owner, slot] = dataset.y[g]
        graph_mask[owner, slot] = 1.0
        num_graphs[owner] += 1

        for j in range(gn):
            n_glob = offset + j
            sh = n_glob // s
            x[sh, n_glob - sh * s] = dataset.x[ns + j]
            node_mask[sh, n_glob - sh * s] = 1.0
            # ownership rows in the OWNER's extended coordinates
            ext = n_glob - owner * s + h
            node_graph_ext[owner, ext] = slot

        es, ee = dataset.edge_ptr[g], dataset.edge_ptr[g + 1]
        src = dataset.edge_src[es:ee].astype(np.int64) + offset
        dst = dataset.edge_dst[es:ee].astype(np.int64) + offset
        keep = src != dst  # strip self-loops once
        src, dst = src[keep], dst[keep]
        dsh = dst // s  # dst-partitioned
        for sh in np.unique(dsh):
            m = dsh == sh
            edges[int(sh)].append(
                (src[m] - sh * s + h, dst[m] - sh * s)
            )
        offset += gn

    edge_src_ext = np.zeros((g_count, shard_edges), np.int32)
    edge_dst_loc = np.full((g_count, shard_edges), s - 1, np.int32)
    edge_mask = np.zeros((g_count, shard_edges), np.float32)
    for sh in range(g_count):
        if not edges[sh]:
            continue
        src = np.concatenate([a for a, _ in edges[sh]])
        dst = np.concatenate([b for _, b in edges[sh]])
        if len(src) > shard_edges:
            raise ValueError(
                f"shard {sh}: {len(src)} edges > budget {shard_edges}"
            )
        order = np.argsort(dst, kind="stable")
        edge_src_ext[sh, : len(src)] = src[order]
        edge_dst_loc[sh, : len(src)] = dst[order]
        edge_mask[sh, : len(src)] = 1.0
        # keep the dst column globally sorted across padding (pad dst=S−1)
        # — same packer contract as batching/packer.py

    return HaloBatch(
        x=x,
        edge_src_ext=edge_src_ext,
        edge_dst_loc=edge_dst_loc,
        edge_mask=edge_mask,
        node_mask=node_mask,
        node_graph_ext=node_graph_ext,
        y=y,
        graph_mask=graph_mask,
        num_graphs=num_graphs,
        halo=h,
    )


def pack_step_halo(
    dataset: GraphSet,
    graph_indices: Sequence[int],
    n_data: int,
    n_graph: int,
    shard_nodes: int,
    shard_edges: int,
    shard_graphs: int,
    halo: int,
) -> HaloBatch:
    """One DP×halo training step: split the batch into `n_data` balanced
    contiguous sub-batches, node-shard each over `n_graph` shards, and
    stack data-major to the [n_data·n_graph, ...] leading axis
    `parallel.halo.make_halo_loss` shards with P(("data", "graph"))."""
    idx = np.asarray(graph_indices, dtype=np.int64)
    splits = np.array_split(idx, n_data)
    packed = [
        pack_batch_halo(
            dataset, part, n_graph, shard_nodes, shard_edges,
            shard_graphs, halo,
        )
        for part in splits
    ]
    return _jtu.tree_map(lambda *xs: np.concatenate(xs, axis=0), *packed)


@dataclasses.dataclass(frozen=True)
class HaloBucket:
    """Static per-fold shard geometry (grow-only, like BucketSpec): every
    batch of ≤ batch_size graphs packs into it, so all epochs share one
    compiled program."""

    shard_nodes: int   # S — node rows per graph-axis shard
    shard_edges: int   # E_s — edge budget per shard
    shard_graphs: int  # B_s — owned-graph slots per shard
    halo: int          # H — exchange width (≥ max nodes per graph)


def halo_bucket(
    dataset: GraphSet,
    batch_size: int,
    n_data: int,
    n_graph: int,
    node_multiple: int = 64,
    edge_multiple: int = 512,
    graph_multiple: int = 4,
) -> HaloBucket:
    """Worst-case shard geometry over ANY batch composition (the
    `batch_size` largest graphs, mirroring compute_bucket).

    S ≥ H is a hard invariant: the left halo rows [g·S−H, g·S) must live
    inside the LEFT NEIGHBOR's shard, which holds only S rows. The edge
    budget is the whole sub-batch's worst edge count — a shard can never
    hold more (dst-partitioned), and the per-device int32 index arrays it
    sizes are small next to the [S, F] feature blocks that DO shrink
    with the graph axis (the point of this layout)."""
    h = halo_width(dataset, node_multiple)
    sub = max(1, -(-batch_size // n_data))
    nc = np.sort(dataset.node_counts())[::-1][:sub]
    ec = np.sort(dataset.edge_counts())[::-1][:sub]
    worst_nodes = int(nc.sum())
    s = max(-(-worst_nodes // n_graph), h)
    s = -(-s // node_multiple) * node_multiple
    e_s = max(int(ec.sum()), 1)
    e_s = -(-e_s // edge_multiple) * edge_multiple
    b_s = -(-sub // graph_multiple) * graph_multiple
    return HaloBucket(s, e_s, b_s, h)


def pack_epoch_halo(
    dataset: GraphSet,
    order: np.ndarray,
    batch_size: int,
    n_data: int,
    n_graph: int,
    bucket: HaloBucket,
) -> HaloBatch:
    """One epoch → HaloBatch with leaves [steps, n_data·n_graph, ...],
    scanned by parallel.halo.make_halo_train_epoch."""
    order = np.asarray(order, dtype=np.int64)
    steps = [
        pack_step_halo(
            dataset, order[i : i + batch_size], n_data, n_graph,
            bucket.shard_nodes, bucket.shard_edges, bucket.shard_graphs,
            bucket.halo,
        )
        for i in range(0, len(order), batch_size)
    ]
    return _jtu.tree_map(lambda *xs: np.stack(xs, axis=0), *steps)


def halo_owned_order(batch: HaloBatch) -> np.ndarray:
    """Map the stacked batch's real (device-major) graph slots back to the
    original packing order: returns flat indices into the [D·G, B_s]
    slot grid, in graph order. Contiguous packing assigns graphs to
    shards in order, so device-major slot traversal IS the original
    order — this helper just drops the padded slots."""
    gm = np.asarray(batch.graph_mask).reshape(-1)
    return np.flatnonzero(gm > 0)
