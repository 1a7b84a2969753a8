"""Batch re-layout for sharded execution.

Two orthogonal partitionings of a packed epoch (SURVEY §2e):

  * **data axis** — each global batch's graphs are split into balanced
    per-device sub-batches (LPT greedy on node counts, capped at
    ⌈batch/n⌉ graphs so the per-shard bucket bound holds). Loss/grads are
    psum'd, so the update equals the single-device global-batch update up
    to float reassociation — the training protocol is preserved.
  * **graph axis** — each sub-batch's (destination-sorted) edge stream is
    split into contiguous chunks; node arrays replicate. Each device
    segment-sums its chunk and one psum reconstitutes the full aggregate.
    Chunk contiguity keeps per-chunk destinations sorted, so the
    `indices_are_sorted` fast path survives partitioning.

Resulting leaf layouts (S = scan steps):
  node/graph leaves  [S, n_data, ...]            → P(None, "data")
  edge leaves        [S, n_data, n_graph, E/n]   → P(None, "data", "graph")
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
from jax.sharding import PartitionSpec as P

import jax.tree_util as jtu

from dgcnn_tpu.batching.packer import BucketSpec, GraphBatch, pack_batch
from dgcnn_tpu.data.graphset import GraphSet

EDGE_FIELDS = ("edge_src", "edge_dst", "edge_mask")


def lpt_assign(node_counts: np.ndarray, n_shards: int, cap: int) -> List[np.ndarray]:
    """Longest-processing-time greedy: balance total nodes per shard with at
    most `cap` graphs each. Returns per-shard index arrays (into the input)."""
    order = np.argsort(node_counts)[::-1]
    totals = np.zeros(n_shards, dtype=np.int64)
    counts = np.zeros(n_shards, dtype=np.int64)
    groups: List[List[int]] = [[] for _ in range(n_shards)]
    for i in order:
        open_shards = np.flatnonzero(counts < cap)
        s = open_shards[np.argmin(totals[open_shards])]
        groups[s].append(int(i))
        totals[s] += node_counts[i]
        counts[s] += 1
    return [np.array(sorted(g), dtype=np.int64) for g in groups]


def shard_bucket(dataset: GraphSet, batch_size: int, n_data: int,
                 node_multiple: int = 128, edge_multiple: int = 256,
                 graph_multiple: int = 4, n_graph: int = 1) -> BucketSpec:
    """Worst-case per-shard bucket: any ≤⌈batch/n⌉-graph group fits."""
    from dgcnn_tpu.batching.packer import compute_bucket

    per_shard = -(-batch_size // n_data)
    b = compute_bucket(dataset, per_shard, node_multiple, edge_multiple, graph_multiple)
    # edge chunking must divide evenly across the graph axis
    e = -(-b.num_edges // (edge_multiple * n_graph)) * (edge_multiple * n_graph)
    return BucketSpec(b.num_nodes, e, b.num_graphs)


def partition_edges(batch: GraphBatch, n_graph: int) -> GraphBatch:
    """Reshape the edge leaves [..., E] → [..., n_graph, E/n_graph]."""
    def reshape(name, arr):
        if name in EDGE_FIELDS:
            e = arr.shape[-1]
            assert e % n_graph == 0, (name, e, n_graph)
            return arr.reshape(arr.shape[:-1] + (n_graph, e // n_graph))
        return arr

    return GraphBatch(
        **{
            f.name: reshape(f.name, getattr(batch, f.name))
            for f in dataclasses.fields(GraphBatch)
        }
    )


def shard_batch_for_dp(
    dataset: GraphSet,
    graph_indices: np.ndarray,
    bucket: BucketSpec,
    n_data: int,
    n_graph: int = 1,
) -> GraphBatch:
    """Pack ONE global batch as `n_data` balanced sub-batches (leaves gain a
    leading [n_data] axis; edge leaves additionally [n_graph])."""
    idx = np.asarray(graph_indices, dtype=np.int64)
    cap = -(-len(idx) // n_data) if len(idx) else 1
    cap = max(cap, 1)
    groups = lpt_assign(dataset.node_counts()[idx], n_data, cap)
    shards = [pack_batch(dataset, idx[g], bucket) for g in groups]
    stacked = jtu.tree_map(lambda *xs: np.stack(xs, axis=0), *shards)
    # edge leaves always carry the graph-axis dim (size 1 when unpartitioned)
    # so downstream specs/local_view are layout-uniform.
    return partition_edges(stacked, n_graph)


def pack_epoch_dp(
    dataset: GraphSet,
    order: np.ndarray,
    batch_size: int,
    bucket: BucketSpec,
    n_data: int,
    n_graph: int = 1,
) -> GraphBatch:
    """Pack a shuffled epoch for the mesh: leaves [S, n_data(, n_graph), ...]."""
    order = np.asarray(order, dtype=np.int64)
    steps = [
        shard_batch_for_dp(dataset, order[i : i + batch_size], bucket, n_data, n_graph)
        for i in range(0, len(order), batch_size)
    ]
    return jtu.tree_map(lambda *xs: np.stack(xs, axis=0), *steps)


def batch_pspecs(scan_axis: bool = True) -> GraphBatch:
    """PartitionSpec pytree matching `pack_epoch_dp` layouts. With
    `scan_axis=False`, specs fit a single step (no leading S axis)."""
    lead = (None,) if scan_axis else ()
    node = P(*lead, "data")
    edge = P(*lead, "data", "graph")
    return GraphBatch(
        x=node,
        edge_src=edge,
        edge_dst=edge,
        edge_mask=edge,
        node_graph=node,
        node_mask=node,
        y=node,
        graph_mask=node,
        num_graphs=node,
    )


def local_view(batch: GraphBatch) -> GraphBatch:
    """Inside shard_map: drop the [1] data-axis dim on every leaf and the
    [1] graph-axis dim on edge leaves → device-local single-batch shapes.
    Asserts the dropped axes really are size 1 — a batch packed for MORE
    shards than the mesh axis would otherwise silently lose sub-batches."""
    def squeeze(name, arr):
        if arr is None:  # optional structure fields (e.g. blockcoo)
            return None
        assert arr.shape[0] == 1, (
            f"{name}: per-device data-axis block is {arr.shape[0]}, "
            f"expected 1 — batch packed for a different mesh shape?"
        )
        arr = arr[0]  # data axis
        if name in EDGE_FIELDS:
            assert arr.shape[0] == 1, (
                f"{name}: per-device graph-axis block is {arr.shape[0]}, "
                f"expected 1 — batch packed for a different mesh shape?"
            )
            arr = arr[0]  # graph axis
        return arr

    return GraphBatch(
        **{
            f.name: squeeze(f.name, getattr(batch, f.name))
            for f in dataclasses.fields(GraphBatch)
        }
    )
