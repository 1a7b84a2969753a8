"""DGCNN — Deep Graph Convolutional Neural Network for graph classification.

The network of the AAAI-2018 paper, with the exact architecture constants of
the reference implementation (reference model.py:9-45):

    4 × [GCNConv → tanh] with dims (F→32→32→32→1)
    skip-concat to 97 channels                       (model.py:34)
    SortPooling k=30                                 (model.py:17,35)
    Conv1d(1,16,97,97) → ReLU                        (model.py:18,37)
    MaxPool1d(2,2) → Conv1d(16,32,5,1) → ReLU        (model.py:19-20,38-39)
    Linear(352,128) → ReLU → Dropout(0.5)            (model.py:21-22,41-42)
    Linear(128,C) → log_softmax                      (model.py:23,43)

Re-designed as a pure function over a parameter pytree: graphs arrive as a
packed `GraphBatch` (static shapes + masks), normalization coefficients are
computed once per forward and shared by all four convolutions, dropout takes
an explicit PRNG key, and every hot op lowers to MXU matmuls or masked
segment reductions. Parameter initialization reproduces the reference's
training-time distributions (PyG glorot for GCN weights, torch
kaiming-uniform(√5) for conv/linear) so from-scratch training dynamics
match.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dgcnn_tpu.batching.dense import DenseGraphBatch
from dgcnn_tpu.batching.packer import GraphBatch
from dgcnn_tpu.ops.gcn import gcn_conv, gcn_degree
from dgcnn_tpu.ops.readout import conv1d_readout
from dgcnn_tpu.ops.sort_pool import sort_pool, sort_pool_dense, sort_pool_folds

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DGCNN:
    """Architecture hyperparameters (reference hardcodes these —
    model.py:13-23; we expose them but default to identical values)."""

    num_features: int
    num_classes: int
    hidden_dims: Tuple[int, ...] = (32, 32, 32, 1)
    sort_pool_k: int = 30
    conv1d_channels: Tuple[int, int] = (16, 32)
    conv1d_kernel: int = 5
    dense_dim: int = 128
    dropout_rate: float = 0.5
    # Mixed precision: matmul/conv operands in this dtype with fp32
    # accumulation (MXU-native bf16 mode); params, biases, softmax and the
    # loss stay fp32. "float32" = exact reference numerics.
    compute_dtype: str = "float32"
    # Dense-layout GCN trunk implementation: "xla" = the einsum chain
    # (8 adjacency reads per step across fwd+bwd); "fused" = the Pallas
    # kernel that keeps each slot's adjacency tile VMEM-resident across
    # all four layers (kernels/dense_trunk.py — 1 read per direction).
    # TPU-only; non-TPU backends and bf16 compute fall back to "xla".
    dense_trunk: str = "xla"

    @property
    def concat_dim(self) -> int:
        return sum(self.hidden_dims)

    @property
    def flat_dim(self) -> int:
        t = self.sort_pool_k // 2 - self.conv1d_kernel + 1
        return t * self.conv1d_channels[1]


def _glorot_uniform(key, shape):
    # PyG Linear(weight_initializer='glorot') — U(±sqrt(6/(fan_in+fan_out)))
    fan_in, fan_out = shape[0], shape[1]
    a = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -a, a)


def _kaiming_uniform_torch(key, shape, fan_in):
    # torch Conv1d/Linear default: kaiming_uniform(a=√5) → U(±1/sqrt(fan_in))
    bound = 1.0 / jnp.sqrt(float(fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(key: jax.Array, model: DGCNN) -> Params:
    # GCN layers consume one key each; conv5/conv6/lin1/lin2 two each.
    # max(16, ...) keeps the key stream identical for the reference
    # architecture (≤8 GCN layers) while supporting deeper stacks.
    keys = jax.random.split(key, max(16, len(model.hidden_dims) + 8))
    ki = iter(keys)

    gcn = []
    in_dim = model.num_features
    for out_dim in model.hidden_dims:
        w = _glorot_uniform(next(ki), (in_dim, out_dim))
        gcn.append({"w": w, "b": jnp.zeros((out_dim,), jnp.float32)})
        in_dim = out_dim

    c5, c6 = model.conv1d_channels
    cat = model.concat_dim
    width = model.conv1d_kernel

    w5 = _kaiming_uniform_torch(next(ki), (cat, c5), fan_in=cat)
    b5 = _kaiming_uniform_torch(next(ki), (c5,), fan_in=cat)
    w6 = _kaiming_uniform_torch(next(ki), (width, c5, c6), fan_in=c5 * width)
    b6 = _kaiming_uniform_torch(next(ki), (c6,), fan_in=c5 * width)

    flat = model.flat_dim
    lin1_w = _kaiming_uniform_torch(next(ki), (flat, model.dense_dim), fan_in=flat)
    lin1_b = _kaiming_uniform_torch(next(ki), (model.dense_dim,), fan_in=flat)
    lin2_w = _kaiming_uniform_torch(
        next(ki), (model.dense_dim, model.num_classes), fan_in=model.dense_dim
    )
    lin2_b = _kaiming_uniform_torch(
        next(ki), (model.num_classes,), fan_in=model.dense_dim
    )

    return {
        "gcn": gcn,
        "conv5": {"w": w5, "b": b5},
        "conv6": {"w": w6, "b": b6},
        "lin1": {"w": lin1_w, "b": lin1_b},
        "lin2": {"w": lin2_w, "b": lin2_b},
    }


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def _pooled_to_log_probs(
    params: Params,
    model: DGCNN,
    pooled: jax.Array,  # [B, k, C]
    deterministic: bool,
    dropout_rng: Optional[jax.Array],
    acts: dict,
):
    """Shared tail: conv1d readout → MLP head → log_softmax
    (reference model.py:36-43). Used by both the COO and dense paths.
    Runs in `pooled.dtype` (the model's compute dtype) until the final
    logits, which are always fp32 for a numerically-stable log_softmax."""
    dt = pooled.dtype
    feats = conv1d_readout(
        pooled,
        params["conv5"]["w"].astype(dt),
        params["conv5"]["b"],
        params["conv6"]["w"].astype(dt),
        params["conv6"]["b"],
    )
    acts["readout"] = feats

    h = jax.nn.relu(
        jnp.dot(feats.astype(dt), params["lin1"]["w"].astype(dt),
                preferred_element_type=jnp.float32)
        + params["lin1"]["b"]
    )
    if not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when deterministic=False")
        keep = 1.0 - model.dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)

    logits = (
        jnp.dot(h.astype(dt), params["lin2"]["w"].astype(dt),
                preferred_element_type=jnp.float32)
        + params["lin2"]["b"]
    )
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    acts["log_probs"] = log_probs
    return log_probs


def apply_coo(
    params: Params,
    model: DGCNN,
    batch: GraphBatch,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    spmm_impl: str = "xla",
    edge_axis: Optional[str] = None,
    return_activations: bool = False,
):
    """Forward pass → log-probabilities [num_graph_slots, num_classes].

    Padded graph slots produce garbage rows; downstream loss/metrics mask
    them with `batch.graph_mask`. With `return_activations=True` also
    returns the per-stage tensors used by the golden-parity harness
    (SURVEY §4: allclose on conv outputs, SortPooling outputs, logits).

    `edge_axis`: mesh axis over which this batch's edge stream is
    partitioned (edge-partitioned graph parallelism, SURVEY §2e) — node
    arrays are replicated on that axis, aggregations are psum'd, and every
    device computes the identical, full forward result.
    """
    num_nodes = batch.x.shape[0]
    num_slots = batch.y.shape[0]

    deg_hat = gcn_degree(
        batch.edge_dst, batch.edge_mask, num_nodes, edge_axis, impl=spmm_impl
    )
    # symmetric norm as node-row scalings around the mask-weighted spmm
    # (ops/gcn.py gcn_conv node_scale) — no per-edge weight lookups
    dinv_sqrt = jax.lax.rsqrt(deg_hat)

    acts = {}
    dt = jnp.dtype(model.compute_dtype)
    x = batch.x.astype(dt)
    # block-pair structure attached by the packer (add_blockcoo) routes the
    # aggregation to the block-COO Pallas kernel; mesh edge-partitioned
    # paths keep the stream formulations (the kernel is single-device)
    structure = w_pad = w_padT = None
    bc = getattr(batch, "blockcoo", None)
    if bc is not None and edge_axis is None and spmm_impl in ("auto", "pallas"):
        structure, w_pad, w_padT = bc
    layer_outs = []
    for i, layer in enumerate(params["gcn"]):
        x = jnp.tanh(
            gcn_conv(
                x,
                layer["w"].astype(dt),
                layer["b"],
                batch.edge_src,
                batch.edge_dst,
                batch.edge_mask,
                deg_hat,
                impl=spmm_impl,
                edge_axis=edge_axis,
                node_scale=dinv_sqrt,
                structure=structure,
                w_pad=w_pad,
                w_padT=w_padT,
            )
        )
        # padded nodes: tanh(0 + b) ≠ 0 once biases train — mask them so
        # they can never leak into SortPooling of real graphs (they carry
        # out-of-range graph ids anyway; masking also keeps activations
        # clean for parity dumps).
        x = (x * batch.node_mask[:, None]).astype(dt)
        layer_outs.append(x)
        acts[f"gcn{i + 1}"] = x

    cat = jnp.concatenate(layer_outs, axis=-1)
    pooled = sort_pool(cat, batch.node_graph, num_slots, model.sort_pool_k)
    acts["sort_pool"] = pooled

    log_probs = _pooled_to_log_probs(
        params, model, pooled, deterministic, dropout_rng, acts
    )
    if return_activations:
        return log_probs, acts
    return log_probs


def _dense_trunk(
    params: Params, model: DGCNN, batch: DenseGraphBatch, acts: dict,
    tag: str = "",
) -> jax.Array:
    """GCN stack + SortPooling on one dense-layout batch → pooled
    [num_graph_slots, k, C]. Shared by the single-tile and multi-tile
    dense paths."""
    if (
        model.dense_trunk == "fused"
        and model.compute_dtype == "float32"
        and jax.default_backend() in ("tpu", "axon")
    ):
        return _dense_trunk_fused_path(params, model, batch, acts, tag)
    dt = jnp.dtype(model.compute_dtype)
    h = batch.x.astype(dt)
    # Propagation dtype: never UPcast a bf16-stored adjacency
    # (Config.adj_dtype) — the MXU's DEFAULT-precision fp32 matmul rounds
    # its operands to bf16 anyway, so feeding the dot bf16 operands with an
    # fp32 accumulator computes the same thing while halving adjacency HBM
    # reads; an astype(f32) here would materialize the fp32 copy instead.
    prop_dt = (
        jnp.bfloat16
        if (batch.adj.dtype == jnp.bfloat16 or dt == jnp.bfloat16)
        else dt
    )
    adj = batch.adj.astype(prop_dt)
    mask = batch.node_mask[..., None].astype(dt)
    layer_outs = []
    for i, layer in enumerate(params["gcn"]):
        hw = jnp.einsum(
            "bnf,fo->bno", h, layer["w"].astype(dt),
            preferred_element_type=jnp.float32,
        )
        h = jnp.tanh(
            jnp.einsum(
                "bij,bjf->bif", adj, hw.astype(prop_dt),
                preferred_element_type=jnp.float32,
            )
            + layer["b"]
        )
        h = (h * mask).astype(dt)
        layer_outs.append(h)
        acts[f"gcn{i + 1}{tag}"] = h

    cat = jnp.concatenate(layer_outs, axis=-1)
    pooled = sort_pool_dense(cat, batch.node_mask, model.sort_pool_k)
    acts[f"sort_pool{tag}"] = pooled
    return pooled


def _dense_trunk_fused_path(
    params: Params, model: DGCNN, batch: DenseGraphBatch, acts: dict,
    tag: str = "",
) -> jax.Array:
    """`_dense_trunk` through the VMEM-resident Pallas kernel
    (kernels/dense_trunk.py): x@W1 and its cotangents stay in XLA, the
    adjacency-coupled chain runs fused. fp32-compute only (gated by the
    caller); the adjacency streams at its storage dtype like the einsum
    path."""
    from dgcnn_tpu.kernels.dense_trunk import gcn_trunk_fused

    prop_dt = (
        jnp.bfloat16 if batch.adj.dtype == jnp.bfloat16 else jnp.float32
    )
    hw1 = jnp.einsum(
        "bnf,fo->bno", batch.x.astype(jnp.float32),
        params["gcn"][0]["w"], preferred_element_type=jnp.float32,
    )
    wsel = jnp.zeros((batch.adj.shape[0],), jnp.int32)
    ws = tuple(l["w"][None] for l in params["gcn"][1:])
    bs = tuple(l["b"][None] for l in params["gcn"])
    cat = gcn_trunk_fused(
        tuple(model.hidden_dims), False, batch.adj.astype(prop_dt),
        hw1, batch.node_mask, wsel, ws, bs,
    )
    off = 0
    for i, d in enumerate(model.hidden_dims):
        acts[f"gcn{i + 1}{tag}"] = cat[:, :, off : off + d]
        off += d
    pooled = sort_pool_dense(cat, batch.node_mask, model.sort_pool_k)
    acts[f"sort_pool{tag}"] = pooled
    return pooled


def apply_dense(
    params: Params,
    model: DGCNN,
    batch: DenseGraphBatch,
    *,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_activations: bool = False,
):
    """Forward pass on the dense block-diagonal layout (batching/dense.py):
    GCN propagation is one batched MXU matmul against the host-precomputed
    normalized adjacency — semantically identical to `apply_coo`
    (test_dense.py asserts logit equality)."""
    acts = {}
    pooled = _dense_trunk(params, model, batch, acts)
    log_probs = _pooled_to_log_probs(
        params, model, pooled, deterministic, dropout_rng, acts
    )
    if return_activations:
        return log_probs, acts
    return log_probs


def apply_multi_dense(
    params: Params,
    model: DGCNN,
    batches: Tuple[DenseGraphBatch, ...],
    *,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
):
    """Forward over one batch SPLIT BY TILE CLASS (batching/multi_dense.py):
    each class runs the dense trunk at its own tile size, pooled rows are
    concatenated, and the readout/MLP head runs once over the union.

    Returns (log_probs, y, graph_mask) concatenated over class slots —
    the slot order is a permutation of the original batch, which is
    irrelevant to the per-batch loss/metric sums.

    Note: classes empty in a given batch COULD be skipped with lax.cond
    (an empty-batch trunk provably yields all-zero pooled rows), saving
    ~25% device time on D&D — but the conditional program costs several
    extra minutes of XLA compile, a net loss at the 100-epoch protocol
    scale on this transport. Unconditional execution keeps compiles
    cheap."""
    pooled = jnp.concatenate(
        [
            _dense_trunk(params, model, b, {}, tag=f"_c{i}")
            for i, b in enumerate(batches)
        ],
        axis=0,
    )
    log_probs = _pooled_to_log_probs(
        params, model, pooled, deterministic, dropout_rng, {}
    )
    y = jnp.concatenate([b.y for b in batches], axis=0)
    graph_mask = jnp.concatenate([b.graph_mask for b in batches], axis=0)
    return log_probs, y, graph_mask


@jax.custom_vjp
def block_propagate(
    hb: jax.Array,  # [nb, bs, F] node features as block-rows
    blocks: jax.Array,  # [W, bs, bs] gathered adjacency blocks
    item_row: jax.Array,  # [W] destination block-row, non-decreasing
    item_col: jax.Array,  # [W] source block-row
    item_permT: jax.Array,  # [W] col-major traversal (see block_sparse.py)
    item_colT: jax.Array,  # [W] its segment ids, non-decreasing
) -> jax.Array:
    """One block-sparse GCN aggregation: `out[r] = Σ_w B_w @ hb[c_w]`
    over destination-sorted work items — a batched MXU matmul plus a
    sorted block segment-sum (fp32 accumulation; returns fp32).

    Custom VJP: the transpose of a sorted segment-sum is an unsorted
    scatter-add under plain autodiff — the TPU slow path. Instead the
    backward runs this SAME kernel over the col-major item traversal
    (`d_hb[c] += B_wᵀ @ g[r]`, segment ids `item_colT` non-decreasing),
    and the adjacency cotangent — never needed, the pool is constant —
    is declared zero instead of being computed per item."""
    nb = hb.shape[0]
    parts = jnp.einsum(
        "wij,wjf->wif", blocks, hb[item_col],
        preferred_element_type=jnp.float32,
    )
    return jax.ops.segment_sum(
        parts, item_row, num_segments=nb + 1, indices_are_sorted=True
    )[:nb]


def _block_propagate_fwd(hb, blocks, item_row, item_col, item_permT, item_colT):
    out = block_propagate(hb, blocks, item_row, item_col, item_permT, item_colT)
    # the empty stub only carries hb's dtype into the backward (a dtype
    # object itself is not a valid JAX residual)
    stub = jnp.zeros((0,), hb.dtype)
    return out, (blocks, item_row, item_permT, item_colT, stub)


def _block_propagate_bwd(res, g):
    import numpy as np

    blocks, item_row, item_permT, item_colT, stub = res
    h_dtype = stub.dtype
    nb, bs = g.shape[0], g.shape[1]
    g_pad = jnp.concatenate([g, jnp.zeros((1, bs, g.shape[2]), g.dtype)])
    rowsT = item_row[item_permT]  # padded items map to row nb → zero block
    # bf16-stored blocks stay bf16 (the cotangent rounds down instead of
    # the W×bs×bs block stream rounding up — same MXU math, half the
    # reads); int8 binary-count pools compute at the forward's hb dtype
    bdt = (
        blocks.dtype if blocks.dtype == jnp.bfloat16
        else h_dtype if blocks.dtype == jnp.int8
        else g.dtype
    )
    partsT = jnp.einsum(
        "wij,wif->wjf", blocks[item_permT].astype(bdt),
        g_pad[rowsT].astype(bdt),
        preferred_element_type=jnp.float32,
    )
    d_hb = jax.ops.segment_sum(
        partsT, item_colT, num_segments=nb + 1, indices_are_sorted=True
    )[:nb]
    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, dtype=f0)
    return (
        d_hb.astype(h_dtype),
        jnp.zeros_like(blocks),  # unused (pool is constant) → DCE'd
        zi(item_row),
        zi(item_row),
        zi(item_permT),
        zi(item_colT),
    )


block_propagate.defvjp(_block_propagate_fwd, _block_propagate_bwd)


# Work items per fori_loop iteration of the chunked propagation. The
# budgets (train/cv.py BlockSparseEngine._budget_for) are epoch-MAX
# shapes: on DD the mean step carries ~590 real items against a 1280
# budget (2.2× padded compute, measured 2026-08-20 host-side; the
# on-chip step anatomy put propagation at 57% of the DD train step).
# Chunking with a TRACED trip count makes time ∝ real items while every
# shape stays static — the TPU-idiomatic answer to ragged work.
# Chunk-size A/B on the DD end-to-end epoch (2026-08-20 on-chip):
# 256 → 35.64 ms, 128 → 35.54 (equal within transport noise; 256 keeps
# half the loop iterations), 512 → 39.33 (padding waste returns). The
# fori_loop's carry dependence serializes chunks, so the win saturates
# once the chunk amortizes loop overhead — don't re-try larger chunks.
_PROP_CHUNK = 256


def _pad_items(a, w_pad, fill):
    w = a.shape[0]
    if w == w_pad:
        return a
    return jnp.concatenate(
        [a, jnp.full((w_pad - w,), fill, a.dtype)]
    )


@jax.custom_vjp
def block_propagate_chunked(
    hb: jax.Array,          # [nb, bs, F] node features as block-rows
    pool: jax.Array,        # [P, bs, bs] dataset block pool (last = zeros)
    item_pool: jax.Array,   # [W] pool index per item (sentinel P−1 padded)
    item_row: jax.Array,    # [W] destination block-row, non-decreasing
    item_col: jax.Array,    # [W] source block-row (0 when padded)
    item_permT: jax.Array,  # [W] col-major traversal (identity on padding)
    item_colT: jax.Array,   # [W] its segment ids, non-decreasing
    num_items: jax.Array,   # [] REAL item count of this batch
) -> jax.Array:
    """`block_propagate` with work ∝ the batch's REAL item count: a
    fori_loop whose (traced) trip count covers only ceil(num_items/256)
    chunks — padded tail chunks are never gathered, multiplied, or
    reduced. Each chunk gathers its pool blocks directly (no [W, bs, bs]
    materialization), so the dominant HBM stream also shrinks to the
    real items. Identical math to `block_propagate` (sentinel rows land
    in the dropped capacity segment; per-chunk partial sums accumulate
    in fp32 — accumulation order differs from the single segment-sum by
    grouping only)."""
    return _chunked_fwd(
        hb, pool, item_pool, item_row, item_col, num_items
    )


def _chunked_fwd(hb, pool, item_pool, item_row, item_col, num_items):
    nb, bs, f = hb.shape
    w = item_row.shape[0]
    # max(1, ·): a zero-item caller (engine budgets never produce one, but
    # direct callers can) must return the zero init, not divide by zero
    chunk = max(1, min(_PROP_CHUNK, w))
    w_pad = -(-w // chunk) * chunk
    sentinel = pool.shape[0] - 1
    ip = _pad_items(item_pool, w_pad, sentinel)
    rows = _pad_items(item_row, w_pad, nb)
    cols = _pad_items(item_col, w_pad, 0)
    trips = jnp.minimum(
        (num_items.astype(jnp.int32) + chunk - 1) // chunk, w_pad // chunk
    )

    def body(k, out):
        st = k * chunk
        ipc = jax.lax.dynamic_slice_in_dim(ip, st, chunk)
        rc = jax.lax.dynamic_slice_in_dim(rows, st, chunk)
        cc = jax.lax.dynamic_slice_in_dim(cols, st, chunk)
        blocks = pool[ipc].astype(hb.dtype)           # [chunk, bs, bs]
        parts = jnp.einsum(
            "wij,wjf->wif", blocks, hb[cc],
            preferred_element_type=jnp.float32,
        )
        return out + jax.ops.segment_sum(
            parts, rc, num_segments=nb + 1, indices_are_sorted=True
        )

    # init carry derived from hb so it inherits hb's varying-axis type
    # under shard_map (a plain zeros literal is "unvarying" and trips
    # the while_loop carry-type check on a mesh)
    init = jnp.zeros((nb + 1, bs, f), jnp.float32) + 0.0 * hb.astype(
        jnp.float32
    ).sum()
    out = jax.lax.fori_loop(0, trips, body, init)
    return out[:nb]


def _chunked_vjp_fwd(hb, pool, item_pool, item_row, item_col, item_permT,
                     item_colT, num_items):
    out = _chunked_fwd(hb, pool, item_pool, item_row, item_col, num_items)
    stub = jnp.zeros((0,), hb.dtype)
    return out, (
        pool, item_pool, item_row, item_permT, item_colT, num_items, stub,
    )


def _chunked_vjp_bwd(res, g):
    import numpy as np

    pool, item_pool, item_row, item_permT, item_colT, num_items, stub = res
    h_dtype = stub.dtype
    nb, bs, f = g.shape
    w = item_row.shape[0]
    chunk = max(1, min(_PROP_CHUNK, w))  # w == 0: zero trips, zero init
    w_pad = -(-w // chunk) * chunk
    sentinel = pool.shape[0] - 1
    # padded tail of the col-major traversal points at the padded tail
    # of item_pool/item_row (sentinel pool block, sentinel row)
    ip = _pad_items(item_pool, w_pad, sentinel)
    rows = _pad_items(item_row, w_pad, nb)
    permT = _pad_items(item_permT, w_pad, w_pad - 1) if w_pad != w else \
        item_permT
    colsT = _pad_items(item_colT, w_pad, nb)
    g_pad = jnp.concatenate([g, jnp.zeros((1, bs, f), g.dtype)])
    # bf16-stored blocks stay bf16 (same trade as _block_propagate_bwd);
    # int8 binary-count pools compute at the forward's hb dtype
    bdt = (
        pool.dtype if pool.dtype == jnp.bfloat16
        else h_dtype if pool.dtype == jnp.int8
        else g.dtype
    )
    trips = jnp.minimum(
        (num_items.astype(jnp.int32) + chunk - 1) // chunk, w_pad // chunk
    )

    def body(k, dhb):
        st = k * chunk
        pt = jax.lax.dynamic_slice_in_dim(permT, st, chunk)
        ct = jax.lax.dynamic_slice_in_dim(colsT, st, chunk)
        ipT = ip[pt]
        rowsT = rows[pt]
        blocks = pool[ipT].astype(bdt)
        partsT = jnp.einsum(
            "wij,wif->wjf", blocks, g_pad[rowsT].astype(bdt),
            preferred_element_type=jnp.float32,
        )
        return dhb + jax.ops.segment_sum(
            partsT, ct, num_segments=nb + 1, indices_are_sorted=True
        )

    # varying-typed init, same reason as the forward's
    initg = jnp.zeros((nb + 1, bs, f), jnp.float32) + 0.0 * g.astype(
        jnp.float32
    ).sum()
    d_hb = jax.lax.fori_loop(0, trips, body, initg)[:nb]
    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, dtype=f0)
    return (
        d_hb.astype(h_dtype),
        jnp.zeros_like(pool),  # pool is constant data → DCE'd
        zi(item_pool),
        zi(item_row),
        zi(item_row),
        zi(item_permT),
        zi(item_colT),
        zi(num_items),
    )


block_propagate_chunked.defvjp(_chunked_vjp_fwd, _chunked_vjp_bwd)


def _dense_trunk_folds(
    params_f: Params, model: DGCNN, batch: DenseGraphBatch, num_folds: int
) -> jax.Array:
    """Fold-aware dense trunk for one tile class: batch arrays are FLAT
    [F·S_c, ...] (fold axis folded into the slot axis — per-slot gathers,
    the propagation einsum, tanh/mask and the sort all run exactly the
    ops the sequential trunk runs, just on a longer batch axis; a
    fold-vmapped form would lower its gathers/scatters to serialized
    batched variants). Only the weight matmuls and biases see the fold
    axis, as true batched MXU matmuls. → pooled [F·S_c, k, C]."""
    dt = jnp.dtype(model.compute_dtype)
    f = num_folds
    s = batch.y.shape[0] // f
    t = batch.x.shape[1]
    h = batch.x.astype(dt)
    prop_dt = (
        jnp.bfloat16
        if (batch.adj.dtype == jnp.bfloat16 or dt == jnp.bfloat16)
        else dt
    )
    adj = batch.adj.astype(prop_dt)
    mask = batch.node_mask[..., None].astype(dt)
    layer_outs = []
    for layer in params_f["gcn"]:
        hw = jnp.einsum(
            "fnd,fdo->fno", h.reshape(f, s * t, -1), layer["w"].astype(dt),
            preferred_element_type=jnp.float32,
        ).reshape(f * s, t, -1)
        agg = jnp.einsum(
            "bij,bjf->bif", adj, hw.astype(prop_dt),
            preferred_element_type=jnp.float32,
        )
        b = layer["b"][:, None, None, :]  # [F, 1, 1, o]
        h = jnp.tanh(agg.reshape(f, s, t, -1) + b).reshape(f * s, t, -1)
        h = (h * mask).astype(dt)
        layer_outs.append(h)
    cat = jnp.concatenate(layer_outs, axis=-1)
    return sort_pool_dense(cat, batch.node_mask, model.sort_pool_k)


def apply_multi_dense_folds(
    params_f: Params,
    model: DGCNN,
    batches: Tuple[DenseGraphBatch, ...],
    num_folds: int,
    *,
    deterministic: bool = True,
    dropout_rng_f: Optional[jax.Array] = None,
):
    """Fold-lockstep forward over one batch split by tile class
    (fold-lockstep twin of `apply_multi_dense`): per-class trunks run on
    flat [F·S_c] batch axes, pooled rows concatenate per fold, and the
    readout/MLP head runs once per fold over the union.

    Returns (log_probs [F, ΣS_c, C], y [F, ΣS_c], graph_mask [F, ΣS_c])
    — slot order within a fold is a permutation of the original batch,
    irrelevant to the per-batch loss/metric sums."""
    f = num_folds
    pooled = jnp.concatenate(
        [
            _dense_trunk_folds(params_f, model, b, f).reshape(
                f, -1, model.sort_pool_k, model.concat_dim
            )
            for b in batches
        ],
        axis=1,
    )  # [F, ΣS_c, k, C]
    y = jnp.concatenate([b.y.reshape(f, -1) for b in batches], axis=1)
    graph_mask = jnp.concatenate(
        [b.graph_mask.reshape(f, -1) for b in batches], axis=1
    )
    if deterministic:
        lp = jax.vmap(
            lambda p, pl: _pooled_to_log_probs(p, model, pl, True, None, {})
        )(params_f, pooled)
    else:
        if dropout_rng_f is None:
            raise ValueError("dropout_rng_f required when deterministic=False")
        lp = jax.vmap(
            lambda p, pl, k: _pooled_to_log_probs(p, model, pl, False, k, {})
        )(params_f, pooled, dropout_rng_f)
    return lp, y, graph_mask


@jax.custom_vjp
def block_propagate_folds(
    hb_f: jax.Array,          # [F, nb, bs, D] per-fold features as block-rows
    pool: jax.Array,          # [P, bs, bs] dataset block pool (last = zeros)
    item_pool: jax.Array,     # [W] flat f-major stream (block_sparse.FoldBlockBatch)
    item_rowseg: jax.Array,   # [W] f·(nb+1)+row, non-decreasing
    item_colsrc: jax.Array,   # [W] f·nb+col into the flattened feature blocks
    item_permT: jax.Array,    # [W] flat col-major traversal
    item_colTseg: jax.Array,  # [W] f·(nb+1)+col, non-decreasing
    num_items: jax.Array,     # [] Σ_f real items
) -> jax.Array:
    """Fold-lockstep block propagation over ONE merged f-major item
    stream: `out[f, r] = Σ_w B_w @ hb_f[f, c_w]` for every fold at once,
    as chunked batched-MXU matmuls + a single sorted segment-sum over
    fold-offset ids. Per-iteration footprint equals the single-fold
    `block_propagate_chunked`'s (256 items — VMEM-fusible; a fold-vmapped
    [F, 256] iteration measured 3.4× less HBM-efficient on-chip,
    2026-08-20), and the traced trip count covers only the folds' TOTAL
    real items — folds' tail paddings don't interleave into the stream.
    Per-fold math identical to `block_propagate_chunked`; fp32 partial
    sums group at different chunk boundaries (grouping-only difference)."""
    return _folds_fwd(hb_f, pool, item_pool, item_rowseg, item_colsrc, num_items)


def _folds_fwd(hb_f, pool, item_pool, item_rowseg, item_colsrc, num_items):
    f, nb, bs, d = hb_f.shape
    w = item_rowseg.shape[0]
    chunk = max(1, min(_PROP_CHUNK, w))
    w_pad = -(-w // chunk) * chunk
    sentinel = pool.shape[0] - 1
    seg_pad = f * (nb + 1)
    ip = _pad_items(item_pool, w_pad, sentinel)
    rows = _pad_items(item_rowseg, w_pad, seg_pad)
    cols = _pad_items(item_colsrc, w_pad, 0)
    trips = jnp.minimum(
        (num_items.astype(jnp.int32) + chunk - 1) // chunk, w_pad // chunk
    )
    hbf = hb_f.reshape(f * nb, bs, d)

    def body(k, out):
        st = k * chunk
        ipc = jax.lax.dynamic_slice_in_dim(ip, st, chunk)
        rc = jax.lax.dynamic_slice_in_dim(rows, st, chunk)
        cc = jax.lax.dynamic_slice_in_dim(cols, st, chunk)
        blocks = pool[ipc].astype(hbf.dtype)
        parts = jnp.einsum(
            "wij,wjf->wif", blocks, hbf[cc],
            preferred_element_type=jnp.float32,
        )
        return out + jax.ops.segment_sum(
            parts, rc, num_segments=seg_pad + 1, indices_are_sorted=True
        )

    init = jnp.zeros((seg_pad + 1, bs, d), jnp.float32) + 0.0 * hb_f.astype(
        jnp.float32
    ).sum()
    out = jax.lax.fori_loop(0, trips, body, init)
    return out[:seg_pad].reshape(f, nb + 1, bs, d)[:, :nb]


def _folds_vjp_fwd(hb_f, pool, item_pool, item_rowseg, item_colsrc,
                   item_permT, item_colTseg, num_items):
    out = _folds_fwd(hb_f, pool, item_pool, item_rowseg, item_colsrc, num_items)
    stub = jnp.zeros((0,), hb_f.dtype)
    return out, (
        pool, item_pool, item_rowseg, item_permT, item_colTseg, num_items, stub,
    )


def _folds_vjp_bwd(res, g):
    import numpy as np

    pool, item_pool, item_rowseg, item_permT, item_colTseg, num_items, stub = res
    h_dtype = stub.dtype
    f, nb, bs, d = g.shape
    w = item_rowseg.shape[0]
    chunk = max(1, min(_PROP_CHUNK, w))
    w_pad = -(-w // chunk) * chunk
    sentinel = pool.shape[0] - 1
    seg_pad = f * (nb + 1)
    ip = _pad_items(item_pool, w_pad, sentinel)
    rows = _pad_items(item_rowseg, w_pad, seg_pad)
    permT = _pad_items(item_permT, w_pad, w_pad - 1) if w_pad != w else \
        item_permT
    colsT = _pad_items(item_colTseg, w_pad, seg_pad)
    # g on the fold-offset id space: per-fold capacity row nb is zero,
    # plus one extra zero row for the padded-item id f·(nb+1)
    g_pad = jnp.concatenate(
        [g, jnp.zeros((f, 1, bs, d), g.dtype)], axis=1
    ).reshape(seg_pad, bs, d)
    g_pad = jnp.concatenate([g_pad, jnp.zeros((1, bs, d), g.dtype)])
    bdt = (
        pool.dtype if pool.dtype == jnp.bfloat16
        else h_dtype if pool.dtype == jnp.int8
        else g.dtype
    )
    trips = jnp.minimum(
        (num_items.astype(jnp.int32) + chunk - 1) // chunk, w_pad // chunk
    )

    def body(k, dhb):
        st = k * chunk
        pt = jax.lax.dynamic_slice_in_dim(permT, st, chunk)
        ct = jax.lax.dynamic_slice_in_dim(colsT, st, chunk)
        ipT = ip[pt]
        rowsT = rows[pt]
        blocks = pool[ipT].astype(bdt)
        partsT = jnp.einsum(
            "wij,wif->wjf", blocks, g_pad[rowsT].astype(bdt),
            preferred_element_type=jnp.float32,
        )
        return dhb + jax.ops.segment_sum(
            partsT, ct, num_segments=seg_pad + 1, indices_are_sorted=True
        )

    initg = jnp.zeros((seg_pad + 1, bs, d), jnp.float32) + 0.0 * g.astype(
        jnp.float32
    ).sum()
    d_hb = jax.lax.fori_loop(0, trips, body, initg)
    d_hb = d_hb[:seg_pad].reshape(f, nb + 1, bs, d)[:, :nb]
    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, dtype=f0)
    return (
        d_hb.astype(h_dtype),
        jnp.zeros_like(pool),  # pool is constant data → DCE'd
        zi(item_pool),
        zi(item_rowseg),
        zi(item_rowseg),
        zi(item_permT),
        zi(item_colTseg),
        zi(num_items),
    )


block_propagate_folds.defvjp(_folds_vjp_fwd, _folds_vjp_bwd)


def apply_block_folds(
    params_f: Params,
    model: DGCNN,
    batch,  # batching.block_sparse.FoldBlockBatch
    pool: jax.Array,
    *,
    deterministic: bool = True,
    dropout_rng_f: Optional[jax.Array] = None,
):
    """Fold-lockstep forward on the block-sparse layout: params carry a
    leading fold axis F, each fold's dense ops run fold-batched, and the
    GCN aggregation of ALL folds runs through `block_propagate_folds`'s
    single merged item stream. Per-fold semantics identical to
    `apply_block` (tests/test_cv_vmap.py block lockstep rows)."""
    dt = jnp.dtype(model.compute_dtype)
    bs = pool.shape[1]
    F, S, _ = batch.x.shape
    nb = S // bs
    num_slots = batch.y.shape[1]
    prop_dt = (
        jnp.bfloat16
        if (pool.dtype == jnp.bfloat16 or dt == jnp.bfloat16)
        else dt
    )
    pool_c = pool if pool.dtype == prop_dt else pool.astype(prop_dt)

    h = batch.x.astype(dt)
    mask = batch.node_mask[..., None].astype(dt)
    layer_outs = []
    for layer in params_f["gcn"]:
        hw = jnp.einsum(
            "fnd,fdo->fno", h, layer["w"].astype(dt),
            preferred_element_type=jnp.float32,
        )
        hb = hw.astype(prop_dt).reshape(F, nb, bs, -1)
        agg = block_propagate_folds(
            hb, pool_c, batch.item_pool, batch.item_rowseg,
            batch.item_colsrc, batch.item_permT, batch.item_colTseg,
            batch.num_items,
        )
        h = jnp.tanh(agg.reshape(F, S, -1) + layer["b"][:, None, :])
        h = (h * mask).astype(dt)
        layer_outs.append(h)

    cat = jnp.concatenate(layer_outs, axis=-1)
    # NO row-block prefilter here, unlike apply_block: the lockstep
    # asymmetry again (2026-08-21 on-chip A/B, DD full lockstep
    # protocol: row_block=bs 37.35 vs row_block=0 36.07 ms/fold-epoch).
    # The batched [F, S] sort parallelizes over folds, so it is not the
    # bottleneck the flat path's sort is, and the prefilter's extra
    # top_k + candidate gathers cost more than the smaller sort saves.
    pooled = sort_pool_folds(
        cat, batch.node_graph, num_slots, model.sort_pool_k
    )

    if deterministic:
        return jax.vmap(
            lambda p, pl: _pooled_to_log_probs(p, model, pl, True, None, {})
        )(params_f, pooled)
    if dropout_rng_f is None:
        raise ValueError("dropout_rng_f required when deterministic=False")
    return jax.vmap(
        lambda p, pl, k: _pooled_to_log_probs(p, model, pl, False, k, {})
    )(params_f, pooled, dropout_rng_f)


def apply_block(
    params: Params,
    model: DGCNN,
    batch,  # batching.block_sparse.BlockBatch
    pool: jax.Array,  # [P+1, bs, bs] shared adjacency block pool
    *,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_activations: bool = False,
    block_impl: str = "xla",
):
    """Forward pass on the block-sparse layout (batching/block_sparse.py):
    GCN propagation is one batched MXU matmul over nonzero-adjacency-block
    work items plus a destination-sorted block segment-sum — per-batch
    FLOPs follow each graph's own block grid instead of a dataset-wide
    tile. Normalization (and the re-added self-loops of reference
    model.py:28-33) is baked into the pool at build time, exactly like the
    dense layouts. Semantically identical to `apply_coo`
    (tests/test_block_sparse.py asserts logit equality).

    block_impl: "xla" runs the batched-einsum + sorted-segment-sum
    formulation above; "pallas" runs the fused CSR-style kernel
    (kernels/block_pallas.py) that streams pool blocks HBM→VMEM per work
    item and never materializes the gathered `[W, bs, bs]` blocks or the
    `[W, bs, F]` parts. Semantically identical — same MXU math and fp32
    accumulation, equality pinned to 1e-6 in tests/test_block_pallas.py;
    the per-row accumulation ORDER differs from XLA's segment-sum
    reduction tree, so last-bit fp32 divergence on chip is possible."""
    dt = jnp.dtype(model.compute_dtype)
    bs = pool.shape[1]
    s_nodes = batch.x.shape[0]
    nb = s_nodes // bs
    num_slots = batch.y.shape[0]

    acts = {}
    h = batch.x.astype(dt)
    mask = batch.node_mask[:, None].astype(dt)
    # never UPcast a bf16-stored pool (Config.adj_dtype) — gather the
    # blocks at storage width and feed the propagation bf16 operands with
    # an fp32 accumulator (same MXU math as DEFAULT-precision fp32)
    prop_dt = (
        jnp.bfloat16
        if (pool.dtype == jnp.bfloat16 or dt == jnp.bfloat16)
        else dt
    )
    on_tpu = jax.default_backend() in ("tpu", "axon")  # axon = the
    # remote-attached TPU platform plugin; Mosaic compiles there too
    if block_impl == "pallas" and not on_tpu and jax.typeof(batch.x).vma:
        # the pallas HLO interpreter cannot run inside shard_map's vma
        # checker (internal dynamic_slice trips it — a JAX rough edge), so
        # virtual-mesh CPU runs (tests, dryrun_multichip) route to the
        # semantically identical XLA formulation; single-device CPU keeps
        # the real interpreter path and real TPUs always run the kernel
        block_impl = "xla"
    if block_impl == "pallas" and pool.dtype != prop_dt:
        # mixed pool/compute dtypes (fp32 pool under bf16 compute): the
        # fused kernel reads the pool at storage width, so it cannot apply
        # the per-block downcast the xla path does — route there instead
        # of computing at a different precision (the engines always store
        # the pool at prop_dt, so only direct callers reach this)
        block_impl = "xla"
    if block_impl == "pallas":
        from dgcnn_tpu.kernels.block_pallas import block_propagate_pallas

        interpret = not on_tpu
    pool_c = pool if pool.dtype == prop_dt else pool.astype(prop_dt)
    layer_outs = []
    for i, layer in enumerate(params["gcn"]):
        hw = jnp.dot(h, layer["w"].astype(dt), preferred_element_type=jnp.float32)
        hb = hw.astype(prop_dt).reshape(nb, bs, -1)
        if block_impl == "pallas":
            agg = block_propagate_pallas(
                hb, pool, batch.item_pool, batch.item_row, batch.item_col,
                batch.item_permT, batch.item_colT, interpret,
            )
        else:
            # chunked XLA formulation: work ∝ the batch's real item
            # count (budgets are epoch maxima — DD means run ~2.2×
            # under budget), pool blocks gathered per chunk
            agg = block_propagate_chunked(
                hb, pool_c, batch.item_pool, batch.item_row,
                batch.item_col, batch.item_permT, batch.item_colT,
                batch.num_items,
            )
        h = jnp.tanh(agg.reshape(s_nodes, -1) + layer["b"])
        h = (h * mask).astype(dt)
        layer_outs.append(h)
        acts[f"gcn{i + 1}"] = h

    cat = jnp.concatenate(layer_outs, axis=-1)
    # block-row-aligned node axis -> row-block top-k prefilter (bs/k x
    # smaller sort, identical selection -- ops/sort_pool.py)
    pooled = sort_pool(
        cat, batch.node_graph, num_slots, model.sort_pool_k, row_block=bs
    )
    acts["sort_pool"] = pooled

    log_probs = _pooled_to_log_probs(
        params, model, pooled, deterministic, dropout_rng, acts
    )
    if return_activations:
        return log_probs, acts
    return log_probs


def apply(params: Params, model: DGCNN, batch, **kwargs):
    """Layout-polymorphic forward: dispatches on the batch type."""
    if isinstance(batch, DenseGraphBatch):
        kwargs.pop("spmm_impl", None)
        kwargs.pop("edge_axis", None)
        return apply_dense(params, model, batch, **kwargs)
    return apply_coo(params, model, batch, **kwargs)
