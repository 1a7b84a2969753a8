"""GCN graph convolution with symmetric normalization.

Reproduces PyG `GCNConv` default semantics (reference model.py:5,13-16,30-33
with no overrides → normalize=True, add_self_loops=True, bias=True):

    X' = D̂^{-1/2} (A + I) D̂^{-1/2} X Θ + b,   D̂ = deg(A) + I

TPU-first decomposition instead of materializing self-loop edges:

    H  = X Θ                       (dense matmul → MXU)
    m_e = d̂(src_e)^{-1/2} d̂(dst_e)^{-1/2} · edge_mask_e
    X' = SpMM(m, H) + d̂^{-1} ⊙ H + b

The self-loop term `d̂^{-1} H` is the diagonal of the normalized adjacency —
adding it densely is one fused multiply-add, cheaper than growing the edge
list by N. Degrees are computed on device from the masked edge stream, so
padded edges and nodes fall out naturally (a padded node has d̂=1 and zero
features, contributing nothing downstream).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.spmm import (
    _ONEHOT_MAX_NF,
    ONEHOT_EDGE_BLOCK,
    bincount_onehot,
    gather_onehot,
    spmm,
)


def _use_onehot(impl: str, num_nodes: int, num_edges: int) -> bool:
    """Same gate as the spmm auto dispatcher (F=1 here): scatter/gather on
    TPU costs ~60 cycles/element, so even the degree bincount and the
    per-edge weight lookups are worth re-expressing as one-hot matmuls —
    measured ~320 µs/step of segment_sum+takes on the NCI1 COO bucket."""
    if num_edges % ONEHOT_EDGE_BLOCK:
        return False
    return impl == "onehot" or (impl == "auto" and num_nodes <= _ONEHOT_MAX_NF)


def gcn_degree(
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    edge_axis: Optional[str] = None,
    impl: str = "xla",
) -> jax.Array:
    """d̂ = in-degree over real edges + 1 (the re-added self-loop).

    PyG computes degrees from the destination column (GCNConv.gcn_norm);
    TU graphs store both edge directions so in == out degree. With the edge
    stream partitioned over mesh axis `edge_axis`, partial in-degrees are
    psum'd so every device holds the full degree vector.
    """
    if _use_onehot(impl, num_nodes, edge_dst.shape[0]):
        deg = bincount_onehot(edge_dst, edge_mask, num_nodes)
    else:
        deg = jax.ops.segment_sum(
            edge_mask, edge_dst, num_segments=num_nodes,
            indices_are_sorted=True,
        )
    if edge_axis is not None:
        deg = jax.lax.psum(deg, edge_axis)
    return deg + 1.0


def gcn_edge_weights(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    deg_hat: jax.Array,
    impl: str = "xla",
) -> jax.Array:
    """Per-edge symmetric-normalization coefficients, 0 on padded edges."""
    dinv_sqrt = jax.lax.rsqrt(deg_hat)
    if _use_onehot(impl, deg_hat.shape[0], edge_src.shape[0]):
        return (
            gather_onehot(dinv_sqrt, edge_src)
            * gather_onehot(dinv_sqrt, edge_dst)
            * edge_mask
        )
    return (
        jnp.take(dinv_sqrt, edge_src) * jnp.take(dinv_sqrt, edge_dst) * edge_mask
    )


def gcn_conv(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    deg_hat: jax.Array,
    impl: str = "xla",
    edge_axis: Optional[str] = None,
    node_scale: Optional[jax.Array] = None,
    structure=None,
    w_pad: Optional[jax.Array] = None,
    w_padT: Optional[jax.Array] = None,
) -> jax.Array:
    """One GCNConv layer given precomputed edge weights and degrees.

    `edge_weight`/`deg_hat` are shared across the 4 stacked convolutions of
    the DGCNN (the reference recomputes them inside every GCNConv call —
    reference model.py:30-33; hoisting is behavior-preserving since the
    graph is static within a forward).

    With `node_scale` (= d̂^{-1/2}) the symmetric normalization is applied
    as two NODE-row scalings around an unweighted spmm — algebraically
    identical to per-edge weights (Σ_e s_src·s_dst·mask·h[src] =
    s_dst·Σ_e mask·(s·h)[src]) but with no per-edge lookups at all, which
    cost ~60 TPU cycles/element each as gathers. `edge_weight` must then
    be the raw edge mask.

    `structure`/`w_pad`/`w_padT` (kernels/spmm_block_coo.py, attached by
    the packer's `add_blockcoo`): routes the aggregation to the block-pair
    Pallas kernel under impl auto/pallas; w_pad must encode the SAME
    weights as `edge_weight` (the packer builds it from the edge mask)."""
    h = jnp.dot(x, weight, preferred_element_type=jnp.float32)
    kw = dict(
        impl=impl, edge_axis=edge_axis,
        structure=structure, w_pad=w_pad, w_padT=w_padT,
    )
    if node_scale is not None:
        s = node_scale.astype(h.dtype)[:, None]
        agg = spmm(
            edge_src, edge_dst, edge_weight, h * s, h.shape[0], **kw
        ) * s
    else:
        agg = spmm(edge_src, edge_dst, edge_weight, h, h.shape[0], **kw)
    agg = agg + h * (1.0 / deg_hat)[:, None]
    return agg + bias
