"""Device-resident COO graphset with on-device ragged batch assembly.

The dense engine (batching/dense.py) keeps the whole dataset in HBM and
ships only a per-epoch shuffle matrix — but it is quadratic in the largest
graph, so datasets like D&D (5.7k-node outliers) fall back to the COO
layout, which until now host-packed and re-shipped every epoch's feature
blocks (~hundreds of MB per epoch over a slow host↔device link).

This module gives the COO path the same device-residency: the flattened
GraphSet arrays (x, per-graph dst-sorted edges, prefix tables) are moved
to HBM ONCE, and a packed `GraphBatch` is assembled INSIDE jit from a
[slots] vector of graph ids using only static-shape primitives —
`cumsum` over per-graph counts, a vectorized segment mapping
(`segment_of` — a measured 2x over jnp.searchsorted's lowered binary
search) to map padded node/edge positions to their batch slot, and row
gathers. The result is
byte-identical to the host packer's output (tests/test_device_coo.py):
per-graph edges are pre-sorted by destination at build time, and slot
offsets increase monotonically, so the concatenated stream is globally
destination-sorted exactly like packer.py's stable argsort.

Memory: O(total nodes × F + total edges) — D&D fits in ~140 MB where its
dense form would need ~150 GB.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.tree_util as jtu

from dgcnn_tpu.batching.packer import BucketSpec, GraphBatch
from dgcnn_tpu.data.graphset import GraphSet


@dataclasses.dataclass
class DeviceGraphSet:
    """A whole GraphSet as device arrays (pytree; device after
    jax.device_put). Row G of the count tables is a zero-count sentinel
    graph used for padded batch slots; row N of `x` is a zero sentinel
    node.

    x:           [N+1, F]  node features (+ zero row at index N)
    node_start:  [G+1]     first row of each graph's nodes (+ sentinel)
    node_count:  [G+1]     nodes per graph (+ 0)
    edge_src:    [E]       graph-LOCAL src, per-graph dst-sorted
    edge_dst:    [E]       graph-LOCAL dst, per-graph sorted ascending
    edge_start:  [G+1]     first edge of each graph (+ sentinel)
    edge_count:  [G+1]     self-loop-stripped edges per graph (+ 0)
    y:           [G+1]     labels (+ 0)
    """

    x: np.ndarray
    node_start: np.ndarray
    node_count: np.ndarray
    edge_src: np.ndarray
    edge_dst: np.ndarray
    edge_start: np.ndarray
    edge_count: np.ndarray
    y: np.ndarray


jtu.register_pytree_node(
    DeviceGraphSet,
    lambda d: (
        tuple(getattr(d, f.name) for f in dataclasses.fields(DeviceGraphSet)),
        None,
    ),
    lambda aux, ch: DeviceGraphSet(*ch),
)


def build_device_graphset(dataset: GraphSet) -> DeviceGraphSet:
    """One-time host-side preparation: strip self-loops (reference
    model.py:28 — the packer does this per batch; here once), sort each
    graph's edges by destination (stable), append sentinels."""
    g = dataset.num_graphs
    srcs, dsts, counts = [], [], np.zeros(g + 1, dtype=np.int32)
    for i in range(g):
        es, ee = dataset.edge_ptr[i], dataset.edge_ptr[i + 1]
        s = dataset.edge_src[es:ee]
        d = dataset.edge_dst[es:ee]
        keep = s != d
        s, d = s[keep], d[keep]
        order = np.argsort(d, kind="stable")
        srcs.append(s[order])
        dsts.append(d[order])
        counts[i] = len(s)
    edge_start = np.zeros(g + 1, dtype=np.int32)
    np.cumsum(counts[:-1], out=edge_start[1:])

    x = np.concatenate(
        [dataset.x.astype(np.float32), np.zeros((1, dataset.num_features), np.float32)]
    )
    node_count = np.concatenate(
        [np.diff(dataset.node_ptr).astype(np.int32), [0]]
    )
    node_start = dataset.node_ptr.astype(np.int32)  # [G+1]; row G = N sentinel
    y = np.concatenate([dataset.y.astype(np.int32), [0]])

    return DeviceGraphSet(
        x=x,
        node_start=node_start,
        node_count=node_count,
        edge_src=np.concatenate(srcs).astype(np.int32) if g else np.zeros(0, np.int32),
        edge_dst=np.concatenate(dsts).astype(np.int32) if g else np.zeros(0, np.int32),
        edge_start=edge_start,
        edge_count=counts,
        y=y,
    )


def batch_extents(
    node_counts: np.ndarray, edge_counts: np.ndarray, order_mat: np.ndarray
) -> tuple:
    """Max (nodes, edges) over the batch rows of an order matrix/tensor
    (last axis = graph slots, −1 padding). The single source of truth for
    bucket sizing — `gather_coo_batch` cannot raise inside jit, so hosts
    MUST size buckets from this before dispatch (see assert_bucket_fits)."""
    rows = np.asarray(order_mat).reshape(-1, order_mat.shape[-1])
    safe = np.maximum(rows, 0)
    valid = rows >= 0
    n = int((np.asarray(node_counts)[safe] * valid).sum(axis=1).max())
    e = int((np.asarray(edge_counts)[safe] * valid).sum(axis=1).max())
    return n, e


def assert_bucket_fits(
    node_counts: np.ndarray,
    edge_counts: np.ndarray,
    order_mat: np.ndarray,
    bucket: BucketSpec,
) -> None:
    """Host-side overflow guard (the equivalent of pack_batch's ValueError
    — on-device assembly would silently truncate instead)."""
    n, e = batch_extents(node_counts, edge_counts, order_mat)
    if n > bucket.num_nodes or e > bucket.num_edges:
        raise ValueError(
            f"batch of {n} nodes / {e} edges overflows bucket {bucket} "
            f"(edge counts may include self-loops stripped at build time, "
            f"so the edge bound is conservative)"
        )


def densify_on_device(dev: DeviceGraphSet, n_tile: int, adj_dtype=None):
    """Build a DenseDataset (batching/dense.py layout: per-graph GCN-
    normalized adjacency + features at one tile) ON DEVICE from the
    compact COO graphset.

    Host-side `build_dense_dataset` materializes O(G·n_tile²) bytes on the
    host and ships them over the host↔device link — minutes for COLLAB's
    ~5 GB on a remote-attached chip. Here only the O(nodes+edges)
    graphset crosses the link; the quadratic arrays are born in HBM with
    ONE scatter over the flat edge stream plus a degree normalize.
    Numerically identical to the host builder (tests/test_device_coo.py).
    """
    return densify_many_on_device([dev], [n_tile], adj_dtype=adj_dtype)[0]


def _fence_build(adj) -> None:
    """Fence a one-time build before training dispatches: enqueueing the
    first fused train dispatch behind a still-executing build makes the
    combined pipeline ~5× slower on the remote transport (measured 436 s
    vs 86 s build+first-chunk for COLLAB). A tiny value fetch is the only
    reliable fence — block_until_ready can return before remote execution
    finishes on this transport."""
    import jax

    if adj.shape[0]:  # an empty tile class has nothing to wait for
        jax.device_get(adj[0, :1, :1])


def _densify_jits(num_graphs: int, n_tile: int, adj_dtype=None):
    """The two jitted densify programs for a (num_graphs, n_tile) class.
    `adj_dtype` (default fp32) is the STORAGE dtype of the normalized
    adjacency (Config.adj_dtype): degree math always runs fp32, the
    normalize program stores its output rounded.

    TWO programs, not one: fusing the edge scatter with the chunked
    normalize makes XLA pick a catastrophically slow schedule for the
    combined program (measured 154 s executing — and minutes compiling —
    for COLLAB's 26.7M-edge, 4.9 GB adjacency; the same math split in two
    runs in seconds). The fp32 normalize donates the adjacency so peak HBM
    stays ~1×; a rounding normalize peaks at 1.5× (fp32 in + rounded out).
    """
    import jax
    import jax.numpy as jnp

    out_dt = jnp.dtype(adj_dtype if adj_dtype is not None else "float32")

    @jax.jit
    def build_raw(dev):
        nc = dev.node_count[:num_graphs]  # [G]
        # features: gather each graph's rows into its tile
        pos = jnp.arange(n_tile, dtype=jnp.int32)
        node_ok = pos[None, :] < nc[:, None]
        rows = dev.node_start[:num_graphs, None] + pos[None, :]
        x = dev.x[jnp.where(node_ok, rows, dev.x.shape[0] - 1)]
        node_mask = node_ok.astype(jnp.float32)

        # adjacency: one scatter of the whole (self-loop-stripped,
        # graph-local) edge stream at indices (graph, dst, src)
        epos = jnp.arange(dev.edge_src.shape[0], dtype=jnp.int32)
        graph_of_edge = jnp.searchsorted(
            dev.edge_start[1 : num_graphs + 1], epos, side="right"
        ).astype(jnp.int32)
        adj = jnp.zeros((num_graphs, n_tile, n_tile), jnp.float32)
        adj = adj.at[graph_of_edge, dev.edge_dst, dev.edge_src].add(1.0)

        # re-added self-loops on real nodes
        diag = jnp.arange(n_tile, dtype=jnp.int32)
        adj = adj.at[:, diag, diag].add(node_mask)
        return x, node_mask, adj

    def normalize(adj):
        # symmetric normalization, in graph chunks through
        # dynamic_update_slice so peak HBM stays ~1× the adjacency (a
        # whole-array `adj * dinv * dinv` would hold input and output
        # simultaneously — 2× at the layout gate's budget edge); degree
        # math is always fp32, only the store is rounded to `out_dt`
        deg = adj.sum(axis=2)
        dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
        out = adj if out_dt == adj.dtype else jnp.zeros(adj.shape, out_dt)
        chunk = max(1, (256 << 20) // max(n_tile * n_tile * 4, 1))
        for i0 in range(0, num_graphs, chunk):
            i1 = min(num_graphs, i0 + chunk)
            blk = jax.lax.dynamic_slice_in_dim(adj, i0, i1 - i0, axis=0)
            dblk = jax.lax.dynamic_slice_in_dim(dinv, i0, i1 - i0, axis=0)
            blk = (blk * dblk[:, :, None] * dblk[:, None, :]).astype(out_dt)
            out = jax.lax.dynamic_update_slice_in_dim(out, blk, i0, axis=0)
        return out

    # donate only when input can alias output (same dtype) — a dtype-
    # changing donation just triggers the unusable-donation warning
    normalize = jax.jit(
        normalize, donate_argnums=(0,) if out_dt == jnp.float32 else ()
    )
    return build_raw, normalize


def densify_many_on_device(devs, tiles, adj_dtype=None):
    """Densify several (DeviceGraphSet, tile) classes, COMPILING all their
    programs concurrently first, then executing sequentially (fenced).

    On this platform the one-time program cost dominates multi-class init
    (~13-30 s XLA compile per class; the persistent compilation cache
    cannot shortcut it — executable deserialization recompiles on load),
    and the per-class programs are independent, so AOT-compile them on a
    thread pool: multi-tile DD engine init drops from ~190 s to ~the
    slowest single compile."""
    import concurrent.futures

    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.batching.dense import DenseDataset

    def compile_class(dev, n_tile):
        g = int(dev.node_start.shape[0] - 1)
        build_raw, normalize = _densify_jits(g, n_tile, adj_dtype)
        adj_shape = jax.ShapeDtypeStruct((g, n_tile, n_tile), jnp.float32)
        return (
            build_raw.lower(dev).compile(),
            normalize.lower(adj_shape).compile(),
        )

    with concurrent.futures.ThreadPoolExecutor(
        max_workers=max(1, len(tiles))
    ) as ex:
        compiled = list(ex.map(compile_class, devs, tiles))

    devs = list(devs)
    out = []
    for i in range(len(devs)):
        dev, (build_c, norm_c) = devs[i], compiled[i]
        # drop the COO buffers and executables as soon as each class is
        # done — keeping every class's graphset pinned through all the
        # multi-GB dense builds raises peak HBM for nothing
        devs[i] = compiled[i] = None
        y = dev.y[: int(dev.node_start.shape[0] - 1)]
        x, node_mask, adj = build_c(dev)
        del dev, build_c
        adj = norm_c(adj)
        _fence_build(adj)
        out.append(DenseDataset(x=x, adj=adj, node_mask=node_mask, y=y))
    return out


def device_graphset_bytes(dataset: GraphSet) -> int:
    return (
        (dataset.total_nodes + 1) * dataset.num_features * 4
        + dataset.total_edges * 8
        + dataset.num_graphs * 24
    )


def segment_of(cum_ends, pos):
    """Vectorized `jnp.searchsorted(cum_ends, pos, side="right")` for a
    SMALL sorted `cum_ends` (the ≤64-slot batch offsets): the count of
    segment ends ≤ pos, one [len(pos), slots] compare + row-sum on the
    VPU. XLA lowers `jnp.searchsorted` to a per-position binary search
    whose serialization measured 2× the ENTIRE remaining assembly cost
    on DD (tools/probe_assemble_anatomy.py, 2026-08-20: full block
    assembly 303 µs/step native vs 163 µs with this form); the O(P·S)
    compare matrix is trivial VPU work at batch slot counts."""
    import jax.numpy as jnp

    return (pos[:, None] >= cum_ends[None, :]).sum(axis=1).astype(jnp.int32)


def gather_coo_batch(
    dev: DeviceGraphSet, idx_row, bucket: BucketSpec, edge_window=None
) -> GraphBatch:
    """Assemble one packed GraphBatch on device from [slots] graph ids
    (−1 = empty slot). Traced inside jit; every shape is bucket-static.

    Matches batching/packer.py `pack_batch` bit-for-bit: same slot
    layout, same padding sentinels (padded nodes carry graph id = slots,
    padded edges src 0 → dst N_pad−1 with mask 0), same destination-
    sorted global edge stream.

    `edge_window=(start, length)` (traced start, static length) assembles
    only that contiguous slice of the batch's edge stream — the
    edge-partitioned mesh path materializes just its own chunk instead of
    gathering all e_pad edges and slicing (node arrays are always full)."""
    import jax.numpy as jnp

    slots = idx_row.shape[0]
    n_pad, e_pad = bucket.num_nodes, bucket.num_edges
    e_start = 0
    if edge_window is not None:
        e_start, e_pad = edge_window
    num_graphs_total = dev.node_start.shape[0] - 1

    valid = idx_row >= 0
    g = jnp.where(valid, idx_row, num_graphs_total)  # sentinel graph: 0 nodes

    # per-slot node/edge extents within the batch
    nc = dev.node_count[g]  # [slots]
    ec = dev.edge_count[g]
    node_off = jnp.concatenate([jnp.zeros(1, nc.dtype), jnp.cumsum(nc)])  # [slots+1]
    edge_off = jnp.concatenate([jnp.zeros(1, ec.dtype), jnp.cumsum(ec)])

    # --- nodes: position p belongs to the slot whose cumulative range
    # contains p; past the total it is padding ---
    pos = jnp.arange(n_pad, dtype=jnp.int32)
    slot = segment_of(node_off[1:], pos)
    slot_c = jnp.minimum(slot, slots - 1)
    in_graph = pos - node_off[slot_c]
    node_mask = pos < node_off[slots]
    src_row = dev.node_start[g[slot_c]] + in_graph
    x = dev.x[jnp.where(node_mask, src_row, dev.x.shape[0] - 1)]
    node_graph = jnp.where(node_mask, slot_c, slots).astype(jnp.int32)

    # --- edges: same mapping over the edge extents ---
    epos = e_start + jnp.arange(e_pad, dtype=jnp.int32)
    eslot = segment_of(edge_off[1:], epos)
    eslot_c = jnp.minimum(eslot, slots - 1)
    in_edge = epos - edge_off[eslot_c]
    edge_mask = epos < edge_off[slots]
    erow = jnp.where(edge_mask, dev.edge_start[g[eslot_c]] + in_edge, 0)
    base = node_off[eslot_c].astype(jnp.int32)
    edge_src = jnp.where(edge_mask, dev.edge_src[erow] + base, 0).astype(jnp.int32)
    edge_dst = jnp.where(
        edge_mask, dev.edge_dst[erow] + base, n_pad - 1
    ).astype(jnp.int32)

    y = jnp.where(valid, dev.y[g], 0).astype(jnp.int32)
    graph_mask = valid.astype(jnp.float32)

    return GraphBatch(
        x=x,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_mask=edge_mask.astype(jnp.float32),
        node_graph=node_graph,
        node_mask=node_mask.astype(jnp.float32),
        y=y,
        graph_mask=graph_mask,
        num_graphs=valid.sum().astype(jnp.int32),
    )
