"""SortPooling — device-side, fully static-shape.

Capability-equivalent of PyG `SortAggregation(k)` / `global_sort_pool`
(reference model.py:17,35): per graph, order nodes descending by the last
feature channel (the 1-wide conv4 output — a continuous WL color), keep the
top-k rows, zero-pad graphs with fewer than k nodes.

TPU-first design: PyG densifies to [B, max_nodes, C] and sorts per graph.
Max nodes per graph can be large (D&D: ~5.7k), so instead we do ONE global
lexicographic sort over the packed node axis:

    sort by (graph_id ASC, key DESC), stable in original node order

then compute each node's within-graph rank from the sorted graph-id run
starts and scatter rows with rank < k into a [B, k, C] output. Everything
is static shape; padded nodes carry graph_id == num_graph_slots and fall
off the end of the scatter (mode="drop"). Stability of `lax.lax.sort`
reproduces PyG's tie handling (equal keys keep node order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_block_candidates(key, node_graph, num_graph_slots, k, row_block):
    """Per-row-block top-k prefilter (round-5 DD sortpool lever): when the
    packed node axis is partitioned into `row_block`-sized runs that each
    belong to ONE graph (the block layout packs graphs block-row-aligned,
    batching/block_sparse.py), a graph's global top-k lies inside the
    union of its row-blocks' top-k — so the expensive stable sort runs
    over nb·k candidates instead of nb·row_block nodes (k=30 vs bs=128:
    a 4.3× smaller sort, −50 µs fwd / −40 µs grad per DD step, on-chip
    probe 2026-08-21 tools/probe_block_opt.py).

    Tie order is IDENTICAL to the full sort: lax.top_k breaks ties by
    lower index, candidates enumerate in (row, rank) order — which for
    equal keys is original node order — and the downstream sort is
    stable.

    Returns (cand_key [nb·k], cand_graph [nb·k], node_idx [nb·k]).
    The candidate keys come straight from top_k's VALUES (padded nodes
    carry −inf, but their graph id == num_graph_slots sorts them into
    the dropped padding group regardless, exactly as in the full sort)
    and the graph ids from a LANE-shaped take_along_axis — the earlier
    flat [nb·k] 1-D gathers measured ~40 µs EACH on the DD step trace
    (T(1024)-layout gathers; tools/summarize_trace.py, 2026-08-21)."""
    n = key.shape[0]
    nb = n // row_block
    keym = jnp.where(
        node_graph < num_graph_slots, key, -jnp.inf
    ).reshape(nb, row_block)
    val, idx = jax.lax.top_k(keym, k)  # [nb, k] ties → lower index first
    node_idx = (
        idx + (jnp.arange(nb, dtype=jnp.int32) * row_block)[:, None]
    ).reshape(-1)
    cand_graph = jnp.take_along_axis(
        node_graph.reshape(nb, row_block), idx, axis=1
    ).reshape(-1)
    return val.reshape(-1), cand_graph, node_idx


def sort_pool(
    x: jax.Array,
    node_graph: jax.Array,
    num_graph_slots: int,
    k: int,
    row_block: int = 0,
) -> jax.Array:
    """[N, C] node features → [num_graph_slots, k, C] sort-pooled features.

    Args:
      x: packed node features, padding rows anywhere (excluded via ids).
      node_graph: graph slot per node; padded nodes == num_graph_slots.
      num_graph_slots: static number of graph slots (B_pad).
      k: static number of nodes kept per graph.
      row_block: when > k and dividing N, the node axis is promised to be
        partitioned into row_block-sized single-graph runs (block layout)
        and the sort runs over per-run top-k candidates only
        (`_row_block_candidates`) — identical output, ~row_block/k
        smaller sort.
    """
    n = x.shape[0]
    key = x[:, -1].astype(jnp.float32)

    if row_block > k and n % row_block == 0:
        key, node_graph, node_idx = _row_block_candidates(
            key, node_graph, num_graph_slots, k, row_block
        )
    else:
        node_idx = jnp.arange(n, dtype=jnp.int32)

    # lexicographic stable sort: graph ascending, key descending. The
    # payload is the ORIGINAL node row of each (possibly prefiltered)
    # entry; entries arrive in original node order for equal keys.
    g_sorted, _, perm = jax.lax.sort(
        (node_graph.astype(jnp.int32), -key, node_idx), num_keys=2
    )

    # within-graph rank = sorted position − first sorted position of my graph
    starts = jnp.searchsorted(
        g_sorted, jnp.arange(num_graph_slots, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    safe_g = jnp.minimum(g_sorted, num_graph_slots - 1)
    rank = (
        jnp.arange(node_idx.shape[0], dtype=jnp.int32)
        - jnp.take(starts, safe_g)
    )

    # scatter INDICES, then gather only the kept rows: the sort decides
    # placement on [n] int keys alone, so the [n, C] feature matrix is
    # never permuted and the row scatter/gather shrinks from n rows to
    # B·k rows (n can be ~25k packed nodes on D&D-sized batches; gathers
    # cost ~60 cycles/index on TPU). Sentinel n marks empty (slot, rank)
    # cells; out-of-range (padding graphs, rank >= k) scatters are dropped.
    idx = jnp.full((num_graph_slots, k), n, jnp.int32)
    idx = idx.at[g_sorted, rank].set(perm, mode="drop")
    valid = idx < n
    pooled = jnp.take(x, jnp.minimum(idx, n - 1).reshape(-1), axis=0)
    pooled = pooled.reshape(num_graph_slots, k, x.shape[1])
    return jnp.where(valid[..., None], pooled, 0)


def sort_pool_folds(
    x: jax.Array,
    node_graph: jax.Array,
    num_graph_slots: int,
    k: int,
    row_block: int = 0,
) -> jax.Array:
    """Fold-lockstep SortPooling: [F, S, C] → [F, num_graph_slots, k, C].

    The per-fold sort stays BATCHED (one [F, S] stable sort — XLA sorts
    rows in parallel), but every gather/scatter around it runs on a
    FLAT fold-offset id space: a fold-vmapped gather/scatter lowers to a
    serialized batched form on TPU (measured 2026-08-20 on the DD
    lockstep step: 4.8 ms/step across the rank gather, the index
    scatter and the row-gather VJP — vs ~0.15 ms for the flat forms).
    Same math per fold as `sort_pool`, but as a PURE GATHER: group g's
    top-i node sits at sorted position starts[g] + i, so the [B·k]
    output enumerates sorted positions directly — no per-node rank
    gather and no [F·S]-element index scatter (each measured ~1.3-1.5 ms
    per DD lockstep step; the gather form touches only B·k indices).

    `row_block` as in `sort_pool`: per-fold row-block top-k prefilter
    shrinks the sorted axis S → (S/row_block)·k with identical output
    (the block lockstep's node axes are block-row-aligned)."""
    f, s, c = x.shape
    sp1 = num_graph_slots + 1  # per-fold groups incl. the padding group
    key = x[..., -1].astype(jnp.float32)

    if row_block > k and s % row_block == 0:
        # batched-row top_k with VALUE reuse + lane-shaped graph-id
        # take_along_axis — same form as _row_block_candidates (the flat
        # [F·S] 1-D gathers this replaced measured ~40 µs each on the
        # DD step trace)
        nb_rows = s // row_block
        keym = jnp.where(
            node_graph < num_graph_slots, key, -jnp.inf
        ).reshape(f * nb_rows, row_block)
        val, idx = jax.lax.top_k(keym, k)  # ties → lower index first
        node_idx = (
            idx + (jnp.arange(f * nb_rows, dtype=jnp.int32)
                   * row_block)[:, None]
        ).reshape(f, nb_rows * k) % s  # per-fold-local original rows
        key = val.reshape(f, nb_rows * k)
        node_graph = jnp.take_along_axis(
            node_graph.reshape(f * nb_rows, row_block), idx, axis=1
        ).reshape(f, nb_rows * k)
    else:
        node_idx = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[None, :], (f, s)
        )
    n_sub = node_idx.shape[1]
    g_sorted, _, perm = jax.lax.sort(
        (node_graph.astype(jnp.int32), -key, node_idx), num_keys=2
    )

    foff = (jnp.arange(f, dtype=jnp.int32) * sp1)[:, None]
    gid = (g_sorted + foff).reshape(-1)  # [F·n_sub], non-decreasing
    bounds = jnp.searchsorted(
        gid, jnp.arange(f * sp1 + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # group run starts; bounds[-1] == F·n_sub

    # output cell (group, i) ← sorted position starts[group] + i, valid
    # while it stays inside the group's run
    pos = bounds[:-1, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = (pos < bounds[1:, None]).reshape(-1)  # [F·sp1·k]
    pos = jnp.minimum(pos, f * n_sub - 1).reshape(-1)
    perm_flat = (
        perm + (jnp.arange(f, dtype=jnp.int32) * s)[:, None]
    ).reshape(-1)
    rows = jnp.take(perm_flat, pos)  # [F·sp1·k] node rows, unique-if-valid
    # invalid cells → distinct out-of-range rows, so the backward's
    # scatter-add carries genuinely UNIQUE indices (drop-mode removes
    # them); without the hint XLA emits a serialized general scatter
    # (measured 1.25 ms/step on the DD lockstep program)
    rows_grad = jnp.where(
        valid, rows, f * s + jnp.arange(rows.shape[0], dtype=jnp.int32)
    )
    xf = x.reshape(f * s, c)
    pooled = _unique_rows_gather(xf, rows_grad)
    pooled = jnp.where(valid[:, None], pooled, 0)
    return pooled.reshape(f, sp1, k, c)[:, :num_graph_slots]


@jax.custom_vjp
def _unique_rows_gather(xf: jax.Array, rows: jax.Array) -> jax.Array:
    """`xf[min(rows, n-1)]` whose backward is a UNIQUE-index scatter-add:
    callers guarantee `rows` are pairwise distinct, with out-of-range
    values marking rows whose cotangent must be dropped."""
    return jnp.take(xf, jnp.minimum(rows, xf.shape[0] - 1), axis=0)


def _unique_rows_gather_fwd(xf, rows):
    return _unique_rows_gather(xf, rows), (rows, xf.shape[0])


def _unique_rows_gather_bwd(res, g):
    import numpy as np

    rows, n = res
    d_xf = jnp.zeros((n, g.shape[1]), g.dtype).at[rows].add(
        g, mode="drop", unique_indices=True
    )
    return d_xf, np.zeros(rows.shape, dtype=jax.dtypes.float0)


_unique_rows_gather.defvjp(_unique_rows_gather_fwd, _unique_rows_gather_bwd)


def sort_pool_dense(x: jax.Array, node_mask: jax.Array, k: int) -> jax.Array:
    """SortPooling for the dense block-diagonal layout: [B, n, C] → [B, k, C].

    `lax.top_k` on the masked last channel; equal keys resolve to the lower
    node index (matching PyG's stable descending sort); graphs with fewer
    than k real nodes zero-pad (−inf sentinel rows are zeroed).

    Row selection is a ONE-HOT MXU matmul, not take_along_axis: the
    per-row gather and its scatter-add transpose were the two hottest ops
    of the NCI1 fold-lockstep step (287 µs of 624, 2026-08-20 trace);
    the one-hot einsum and its matmul transpose stream at memory
    bandwidth in both directions. Exact row values (each output row is
    1.0 × one input row, fp32-accumulated)."""
    if x.shape[1] < k:  # whole dataset smaller than k → pad node axis
        pad = k - x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, 0), (0, pad)))
    key = jnp.where(node_mask > 0, x[..., -1].astype(jnp.float32), -jnp.inf)
    top_val, top_idx = jax.lax.top_k(key, k)
    onehot = (
        top_idx[..., None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[1]), 2)
    ).astype(x.dtype)  # [B, k, n]
    pooled = jnp.einsum(
        "bkn,bnc->bkc", onehot, x, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return jnp.where(jnp.isfinite(top_val)[..., None], pooled, 0.0)

