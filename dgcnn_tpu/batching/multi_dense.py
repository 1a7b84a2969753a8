"""Size-bucketed multi-tile dense layout — MXU compute for skewed datasets.

The single-tile dense layout (batching/dense.py) is quadratic in the
DATASET's largest graph, so heavy-tailed datasets (D&D: median ~240
nodes, max ~5.7k) fall back to the gather-bound COO path and pay ~60
cycles per edge. Here each graph is stored dense at the smallest
GEOMETRIC TILE that holds it (256, 512, 1024, ... — per-graph normalized
adjacency, like dense.py), and a batch is computed per tile class:
gather the class's graphs, run the GCN trunk as a class-batched MXU
matmul, sort-pool, then concatenate the pooled rows of all classes for
the shared readout/loss. Per-batch FLOPs follow each graph's OWN tile
(Σ S_c·t_c²) instead of max_tile² — for D&D that is ~50× less dense
compute than one global tile, and ~25× faster than the COO path's
per-edge gathers.

Exact protocol: batches keep their membership; only the compute grouping
changes. Equality with the COO path is tested per logit
(tests/test_multi_dense.py).

Memory: Σ_c G_c·t_c·(t_c+F+1)·4 bytes device-resident (D&D ≈ 2.8 GB) —
`multi_dense_bytes` gates the auto layout choice.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from dgcnn_tpu.batching.dense import DenseDataset, build_dense_dataset
from dgcnn_tpu.data.graphset import GraphSet


@dataclasses.dataclass
class MultiDenseRouting:
    """Host-side routing tables (never shipped to device)."""

    tiles: Tuple[int, ...]  # tile size per class, ascending
    class_of: np.ndarray  # [G] class index of each graph
    index_in_class: np.ndarray  # [G] row of the graph inside its class


def plan_tiles(
    node_counts: np.ndarray, min_tile: int = 256, multiple: int = 8
) -> Tuple[int, ...]:
    """Geometric (×2) tile ladder from min_tile up to the largest graph
    (top tile rounded to `multiple`). Classes that would hold no graphs
    are dropped."""
    max_n = int(np.asarray(node_counts).max())
    tiles: List[int] = []
    t = min_tile
    while t < max_n:
        tiles.append(t)
        t *= 2
    tiles.append(-(-max_n // multiple) * multiple)
    # drop empty classes
    prev = 0
    kept = []
    for t in tiles:
        if ((node_counts > prev) & (node_counts <= t)).any():
            kept.append(t)
        prev = t
    return tuple(kept)


def build_routing(node_counts: np.ndarray, tiles: Sequence[int]) -> MultiDenseRouting:
    nc = np.asarray(node_counts)
    if len(nc) and int(nc.max()) > int(tiles[-1]):
        # searchsorted would assign class len(tiles): the graph belongs to
        # no tile and route_order_rows would silently drop it from every
        # batch — a protocol violation with no diagnostic
        raise ValueError(
            f"largest graph has {int(nc.max())} nodes > top tile "
            f"{int(tiles[-1])}; tiles must cover every graph"
        )
    class_of = np.searchsorted(np.asarray(tiles), nc, side="left").astype(np.int32)
    index_in_class = np.zeros(len(nc), dtype=np.int32)
    for c in range(len(tiles)):
        members = np.flatnonzero(class_of == c)
        index_in_class[members] = np.arange(len(members), dtype=np.int32)
    return MultiDenseRouting(tuple(int(t) for t in tiles), class_of, index_in_class)


def build_multi_dense(
    dataset: GraphSet, tiles: Sequence[int]
) -> Tuple[Tuple[DenseDataset, ...], MultiDenseRouting]:
    """Host-side one-time materialization: one DenseDataset per tile
    class over that class's graphs (rows in global-graph-id order)."""
    routing = build_routing(dataset.node_counts(), tiles)
    classes = []
    for c, t in enumerate(routing.tiles):
        members = np.flatnonzero(routing.class_of == c)
        classes.append(build_dense_dataset(dataset.subset(members), int(t)))
    return tuple(classes), routing


def build_multi_dense_on_device(
    dataset: GraphSet, tiles: Sequence[int], adj_dtype=None
) -> Tuple[Tuple[DenseDataset, ...], MultiDenseRouting]:
    """Device-side materialization: per class, ship the compact COO
    subset and densify in HBM (batching/device_coo.py densify_on_device)
    — O(nodes+edges) over the link instead of O(Σ G_c·t_c²)."""
    import jax

    from dgcnn_tpu.batching.device_coo import (
        build_device_graphset,
        densify_many_on_device,
    )

    routing = build_routing(dataset.node_counts(), tiles)
    devs = [
        jax.device_put(build_device_graphset(
            dataset.subset(np.flatnonzero(routing.class_of == c))
        ))
        for c in range(len(routing.tiles))
    ]
    classes = densify_many_on_device(
        devs, [int(t) for t in routing.tiles], adj_dtype=adj_dtype
    )
    return tuple(classes), routing


def multi_dense_bytes(dataset: GraphSet, tiles: Sequence[int]) -> int:
    nc = dataset.node_counts()
    routing = build_routing(nc, tiles)
    total = 0
    for c, t in enumerate(routing.tiles):
        g = int((routing.class_of == c).sum())
        total += g * t * (t + dataset.num_features + 1) * 4
    return total


def route_order_rows(
    routing: MultiDenseRouting, ids: np.ndarray, slots: Sequence[int]
) -> List[np.ndarray]:
    """One global batch → per-class index rows [slots_c] (−1 padded),
    indices into each class's DenseDataset. Raises on slot overflow (the
    engine sizes slots grow-only from the actual epoch, like the COO
    adaptive buckets)."""
    ids = np.asarray(ids)
    rows = []
    for c, s in enumerate(slots):
        members = ids[routing.class_of[ids] == c]
        if len(members) > s:
            raise ValueError(
                f"class {c} has {len(members)} graphs > {s} slots"
            )
        row = np.full(s, -1, dtype=np.int32)
        row[: len(members)] = routing.index_in_class[members]
        rows.append(row)
    return rows


def class_batch_counts(
    routing: MultiDenseRouting, order: np.ndarray, batch_size: int
) -> np.ndarray:
    """[steps, num_classes] per-batch class membership counts — the slot
    sizing input."""
    order = np.asarray(order)
    steps = -(-len(order) // batch_size)
    out = np.zeros((steps, len(routing.tiles)), dtype=np.int64)
    for s in range(steps):
        chunk = order[s * batch_size : (s + 1) * batch_size]
        cls, cnt = np.unique(routing.class_of[chunk], return_counts=True)
        out[s, cls] = cnt
    return out
