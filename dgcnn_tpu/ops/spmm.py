"""SpMM — weighted sparse-matrix × dense-matrix product over COO edges.

Computes `out[i] = Σ_{e: dst[e]==i} w[e] · h[src[e]]`, the per-edge
gather-scale-scatter at the heart of GCN propagation. Capability-equivalent
of torch-scatter's `scatter_add` inside PyG's `GCNConv.propagate`
(reference model.py:30-33; torch-scatter install at reference README.md:17),
re-designed for TPU:

  * `impl="xla"`: `jnp.take` + `jax.ops.segment_sum`. Edges arrive
    destination-sorted from the packer, so we pass
    `indices_are_sorted=True` and XLA lowers the scatter to an efficient
    sorted-segment reduction.
  * `impl="onehot"`: gather/scatter re-expressed as block one-hot
    matmuls on the MXU (see `spmm_onehot`) — wins when N·F is small.
  * `impl="auto"`: onehot when profitable, else the xla path.
  * `impl="pallas"`: hand-written Mosaic kernel (kernels/spmm_pallas.py)
    that keeps the dense feature block VMEM-resident and pipelines the
    edge stream from HBM.

Padded edges carry weight 0 (src 0 → dst N_pad−1, keeping the destination
column sorted — the packer contract), so they contribute exactly nothing —
no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spmm_xla(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    h: jax.Array,
    num_nodes: int,
) -> jax.Array:
    gathered = jnp.take(h, edge_src, axis=0) * edge_weight[:, None]
    return jax.ops.segment_sum(
        gathered,
        edge_dst,
        num_segments=num_nodes,
        indices_are_sorted=True,
    )


# block size of the one-hot formulation; also the alignment the auto
# dispatcher checks (keep in sync — a mismatched gate would select a
# stream that fails spmm_onehot's divisibility check at trace time)
ONEHOT_EDGE_BLOCK = 1024


def gather_onehot(
    vec: jax.Array, ids: jax.Array, block: int = ONEHOT_EDGE_BLOCK
) -> jax.Array:
    """`vec[ids]` as block one-hot matmuls — TPU has no hardware gather
    (a native gather costs ~60 cycles/element, ~300 µs for an 8K edge
    stream), but the MXU turns the same lookup into trivially-small
    matmuls that XLA fuses without materializing the one-hots in HBM."""
    (n,) = vec.shape
    e = ids.shape[0]
    if e % block:
        raise ValueError(f"id count {e} not a multiple of {block}")
    iota = jnp.arange(n, dtype=jnp.int32)

    def blk(i):  # [block] ids → [block] values
        oh = (i[:, None] == iota[None, :]).astype(jnp.float32)
        return jnp.dot(
            oh, vec[:, None].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )[:, 0]

    out = jax.vmap(blk)(ids.reshape(e // block, block))
    return out.reshape(e).astype(vec.dtype)


def bincount_onehot(
    ids: jax.Array, weights: jax.Array, num_segments: int,
    block: int = ONEHOT_EDGE_BLOCK,
) -> jax.Array:
    """`segment_sum(weights, ids)` as block one-hot matmuls — the scatter
    twin of `gather_onehot` (TPU scatter is as slow as its gather)."""
    e = ids.shape[0]
    if e % block:
        raise ValueError(f"id count {e} not a multiple of {block}")
    iota = jnp.arange(num_segments, dtype=jnp.int32)

    def blk(i, w):  # [block] each → [num_segments] partial
        oh = (i[:, None] == iota[None, :]).astype(jnp.float32)
        return jnp.dot(
            w[None, :].astype(jnp.float32), oh,
            preferred_element_type=jnp.float32,
        )[0]

    outs = jax.vmap(blk)(
        ids.reshape(e // block, block), weights.reshape(e // block, block)
    )
    return outs.sum(axis=0).astype(weights.dtype)


def spmm_onehot(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    h: jax.Array,
    num_nodes: int,
    block: int = ONEHOT_EDGE_BLOCK,
) -> jax.Array:
    """SpMM as MXU matmuls — the TPU answer to "no hardware gather".

    Per block of `block` edges, build one-hot selector matrices from the
    index streams (an iota compare, pure VPU) and express gather and
    scatter as two matmuls:

        out += OneHot(dst)ᵀ @ (w ⊙ (OneHot(src) @ h))

    Per-edge cost is 4·N·F FLOPs on the MXU instead of a ~60-cycle
    serialized row gather, which wins whenever N·F is small enough —
    the NCI1-class buckets (N≈3.3k, F=32) run ~4-6× faster than the
    gather path; the dispatcher gates on `_ONEHOT_MAX_NF`. Exactness:
    selectors are exact {0,1} floats, accumulation is an fp32 matmul —
    same dtype discipline as segment_sum up to reduction order.

    Padded edges carry weight 0, so their product rows are exactly zero.
    """
    e = edge_src.shape[0]
    if e % block:
        raise ValueError(f"edge count {e} not a multiple of {block}")
    iota = jnp.arange(num_nodes, dtype=jnp.int32)

    def block_out(s, d, w):  # [block] each → [N, F] partial
        oh_src = (s[:, None] == iota[None, :]).astype(h.dtype)
        gathered = jnp.dot(oh_src, h, preferred_element_type=jnp.float32)
        gathered = gathered * w[:, None]
        oh_dst = (d[:, None] == iota[None, :]).astype(h.dtype)
        return jnp.dot(oh_dst.T, gathered, preferred_element_type=jnp.float32)

    nb = e // block
    # vmap-and-sum instead of a scan carry: carry-free, so it composes
    # with shard_map (a scan carry's varying-axes type would mismatch its
    # unvarying zeros init inside the edge-partitioned mesh path), and
    # XLA fuses the block-sum anyway. fp32 accumulation throughout.
    outs = jax.vmap(block_out)(
        edge_src.reshape(nb, block),
        edge_dst.reshape(nb, block),
        edge_weight.reshape(nb, block),
    )
    return outs.sum(axis=0).astype(h.dtype)


def sddmm_xla(
    edge_src: jax.Array, edge_dst: jax.Array, a: jax.Array, b: jax.Array
) -> jax.Array:
    """Sampled dense-dense matmul: per-edge row dot products
    `out[e] = ⟨a[src[e]], b[dst[e]]⟩` — torch-sparse's SDDMM (reference
    README.md:18; in this model it is the edge-weight cotangent of the
    SpMM backward). Gather formulation: two row gathers + a row reduce."""
    out = (jnp.take(a, edge_src, axis=0) * jnp.take(b, edge_dst, axis=0)).sum(-1)
    # fp32 like sddmm_onehot: impl="auto" flips between the two on shape
    # gates, and the spmm_pallas custom-VJP needs an fp32 edge cotangent
    return out.astype(jnp.promote_types(a.dtype, jnp.float32))


def sddmm_onehot(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    a: jax.Array,
    b: jax.Array,
    block: int = ONEHOT_EDGE_BLOCK,
) -> jax.Array:
    """SDDMM as block one-hot MXU matmuls — the same no-hardware-gather
    trade as `spmm_onehot`: per block of `block` edges, both row lookups
    become selector matmuls and the edge dot products a rowwise reduce:

        out = rowsum( (OneHot(src) @ a) ⊙ (OneHot(dst) @ b) )

    fp32 accumulation; wins whenever N·F is small (the dispatcher gate)."""
    e = edge_src.shape[0]
    if e % block:
        raise ValueError(f"edge count {e} not a multiple of {block}")
    iota = jnp.arange(a.shape[0], dtype=jnp.int32)

    def blk(s, d):  # [block] each → [block] edge dots
        oh_s = (s[:, None] == iota[None, :]).astype(a.dtype)
        oh_d = (d[:, None] == iota[None, :]).astype(b.dtype)
        ga = jnp.dot(oh_s, a, preferred_element_type=jnp.float32)
        gb = jnp.dot(oh_d, b, preferred_element_type=jnp.float32)
        return (ga * gb).sum(-1)

    nb = e // block
    out = jax.vmap(blk)(
        edge_src.reshape(nb, block), edge_dst.reshape(nb, block)
    )
    return out.reshape(e).astype(jnp.promote_types(a.dtype, jnp.float32))


def sddmm(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    a: jax.Array,
    b: jax.Array,
    impl: str = "auto",
) -> jax.Array:
    """Dispatcher with the same gates/fallbacks as `spmm`: the one-hot MXU
    formulation when N·F is small and the edge stream is block-aligned,
    else the gather path."""
    aligned = edge_src.shape[0] % ONEHOT_EDGE_BLOCK == 0
    nf = a.shape[0] * a.shape[1]
    if (impl == "onehot" and aligned) or (
        impl == "auto" and nf <= _ONEHOT_MAX_NF and aligned
    ):
        return sddmm_onehot(edge_src, edge_dst, a, b)
    if impl in ("xla", "auto", "onehot"):
        return sddmm_xla(edge_src, edge_dst, a, b)
    raise ValueError(f"unknown sddmm impl {impl!r}")


# one-hot SpMM pays 4·N·F FLOPs/edge; the gather path pays ~60 cycles/edge.
# The FLOP model put the crossover at N·F ≲ 8e5, but the MEASURED sweep
# (tools/probe_onehot_breakeven.py, 2026-08-20 v5e, F=32, E=4N,
# batch-structured) crosses much earlier — effective one-hot throughput
# is well below MXU peak at these shapes:
#     N=2048 (N·F  65K): onehot  14.3 µs vs xla  81.8  (5.7× faster)
#     N=4096 (N·F 131K): onehot 102.2 µs vs xla 171.3  (1.7× faster)
#     N=8192 (N·F 262K): onehot 450.4 µs vs xla 337.8  (1.3× SLOWER)
#     N=16K  (N·F 524K): onehot 1742  µs vs xla 654.8  (2.7× SLOWER)
# → gate at 150K (below the geometric midpoint: one-hot's loss grows
# linearly in N past the crossover while xla's cost is sublinear, so
# erring low is cheap and erring high is not — DD's end-to-end COO probe
# measured exactly that wreck at N·F=458K, tools/probe_dd_coo.py).
_ONEHOT_MAX_NF = 150_000


# block-pair structures below this fill fraction (real edges / padded
# slots) degenerate — the per-item padding waste exceeds what the smaller
# selectors save vs the one-hot path (kernels/spmm_block_coo.py docstring)
_BLOCK_COO_MIN_FILL = 0.25


def spmm(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    h: jax.Array,
    num_nodes: int,
    impl: str = "xla",
    edge_axis: Optional[str] = None,
    structure=None,          # kernels.spmm_block_coo.BlockCOO, host-built
    w_pad: Optional[jax.Array] = None,   # [W, EB] weights, fwd slot order
    w_padT: Optional[jax.Array] = None,  # [WT, EB] transpose slot order
) -> jax.Array:
    """`edge_axis`: mesh axis name over which the edge stream is partitioned
    (SURVEY §2e item 2 — each device owns a slice of the batch adjacency and
    computes a partial aggregate over the full, replicated node set; one
    psum over ICI reconstitutes the exact single-chip result).

    `structure` (+ `w_pad`/`w_padT`, from `kernels.spmm_block_coo`
    `build_block_coo`/`pad_weights*` — host-built once per packed batch):
    enables the block-pair Pallas kernel, the preferred path under
    impl="auto"/"pallas" when the batch is block-local enough (fill gate)
    and the feature block fits VMEM. `edge_weight` must then equal the
    weights baked into `w_pad` (the packer contract)."""
    if structure is not None and impl in ("auto", "pallas"):
        from dgcnn_tpu.kernels.spmm_block_coo import (
            block_coo_fits,
            spmm_block_coo,
        )

        on_tpu = jax.default_backend() in ("tpu", "axon")
        usable = (
            w_pad is not None
            and w_padT is not None
            # fill gates only the AUTO choice; explicit pallas is an
            # opt-in (engine-attached structures carry fill = −1 sentinels
            # so their static meta is epoch-stable — packer add_blockcoo)
            and (impl == "pallas"
                 or structure.meta.fill >= _BLOCK_COO_MIN_FILL)
            and block_coo_fits(
                num_nodes, h.shape[1], structure.ls.shape[0],
                structure.meta.eb,
            )
            and not (not on_tpu and jax.typeof(h).vma)
            # the pallas HLO interpreter cannot run inside shard_map's
            # vma checker (same JAX rough edge as the other kernels)
        )
        if usable:
            out = spmm_block_coo(structure, w_pad, w_padT, h, not on_tpu)
            if edge_axis is not None:
                out = jax.lax.psum(out, edge_axis)
            return out
    aligned = edge_src.shape[0] % ONEHOT_EDGE_BLOCK == 0
    if (impl == "onehot" and aligned) or (
        impl == "auto"
        and num_nodes * h.shape[1] <= _ONEHOT_MAX_NF
        and aligned
    ):
        out = spmm_onehot(edge_src, edge_dst, edge_weight, h, num_nodes)
    elif impl in ("xla", "auto", "onehot"):
        # misaligned edge streams (e.g. per-shard chunks of an
        # edge-partitioned mesh) degrade to the segment-sum path, the same
        # graceful-fallback contract as impl="pallas"
        out = spmm_xla(edge_src, edge_dst, edge_weight, h, num_nodes)
    elif impl == "pallas" and jax.default_backend() not in ("tpu", "axon") and (
        jax.typeof(h).vma
    ):
        # the pallas HLO interpreter cannot run inside shard_map's vma
        # checker (same JAX rough edge models/dgcnn.py apply_block
        # documents) — non-TPU mesh traces degrade to the segment-sum path
        out = spmm_xla(edge_src, edge_dst, edge_weight, h, num_nodes)
    elif impl == "pallas":
        from dgcnn_tpu.kernels.spmm_pallas import (
            spmm_pallas,
            spmm_pallas_fits,
            spmm_pallas_mxu,
            spmm_pallas_mxu_fits,
        )

        # Mosaic kernels only run compiled on TPU; interpret elsewhere
        # (the CPU test mesh).
        interpret = jax.default_backend() not in ("tpu", "axon")
        if spmm_pallas_mxu_fits(h.shape[0], h.shape[1], edge_src.shape[0]):
            # the MXU selector-tile variant beats the per-edge gather
            # kernel where its VMEM selectors fit
            out = spmm_pallas_mxu(edge_src, edge_dst, edge_weight, h, interpret)
        elif spmm_pallas_fits(h.shape[0], h.shape[1], edge_src.shape[0]):
            out = spmm_pallas(edge_src, edge_dst, edge_weight, h, interpret)
        else:
            out = spmm_xla(edge_src, edge_dst, edge_weight, h, num_nodes)
    else:
        raise ValueError(f"unknown spmm impl {impl!r}")
    if edge_axis is not None:
        out = jax.lax.psum(out, edge_axis)
    return out
