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
  * `impl="pallas"`: hand-written Mosaic kernel (kernels/spmm_pallas.py)
    that keeps the dense feature block VMEM-resident and pipelines the
    edge stream from HBM.

Padded edges carry weight 0 and point at node 0, so they contribute exactly
nothing — no dynamic shapes anywhere.
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


def spmm(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_weight: jax.Array,
    h: jax.Array,
    num_nodes: int,
    impl: str = "xla",
    edge_axis: Optional[str] = None,
) -> jax.Array:
    """`edge_axis`: mesh axis name over which the edge stream is partitioned
    (SURVEY §2e item 2 — each device owns a slice of the batch adjacency and
    computes a partial aggregate over the full, replicated node set; one
    psum over ICI reconstitutes the exact single-chip result)."""
    if impl == "xla":
        out = spmm_xla(edge_src, edge_dst, edge_weight, h, num_nodes)
    elif impl == "pallas":
        from dgcnn_tpu.kernels.spmm_pallas import spmm_pallas, spmm_pallas_fits

        if spmm_pallas_fits(h.shape[0], h.shape[1], edge_src.shape[0]):
            # Mosaic kernels only run compiled on TPU; interpret elsewhere
            # (the CPU test mesh).
            interpret = jax.default_backend() not in ("tpu", "axon")
            out = spmm_pallas(edge_src, edge_dst, edge_weight, h, interpret)
        else:
            out = spmm_xla(edge_src, edge_dst, edge_weight, h, num_nodes)
    else:
        raise ValueError(f"unknown spmm impl {impl!r}")
    if edge_axis is not None:
        out = jax.lax.psum(out, edge_axis)
    return out
