"""Pallas TPU gather-scale-scatter SpMM.

The hot kernel of GCN propagation (the role torch-scatter's CUDA
`scatter_add` plays for the reference — call sites reference
model.py:30-33, install at reference README.md:17), written for the TPU
memory hierarchy:

  * the dense feature block `h` [N, F] lives fully in VMEM for the whole
    kernel — edges stream past it, features never re-read from HBM;
  * edge indices/weights arrive in SMEM tiles (they drive scalar control
    flow: dynamic-slice row addressing);
  * the output accumulator [N, F] also stays VMEM-resident across the
    whole edge stream (constant index_map), written back to HBM once;
  * destination-sorted edges (packer invariant) mean consecutive edges
    usually hit the same output row, so the inner loop carries a running
    (1, F) accumulator and only read-modify-writes VMEM on destination
    change — one RMW per node instead of one per edge at avg degree d̂.

Backward is custom: dL/dh = SpMMᵀ (src/dst swapped — correct without
sorted destinations since the kernel never assumes sortedness for
correctness, only for RMW coalescing), dL/dw = SDDMM (per-edge
⟨h[src], g[dst]⟩).

This kernel targets the regime where node features fit VMEM
(N·128lanes·4B ≲ 8 MB, true for every benchmark bucket except the largest
COLLAB mega-batches); the ops/spmm.py dispatcher falls back to the XLA
path otherwise (`spmm_pallas_fits`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for h + out (bytes); the v5e core has ~16 MB.
_VMEM_BUDGET = 12 * 1024 * 1024
_LANES = 128

# 1-D s32/f32 arrays get an XLA layout tiled to 1024 on TPU; Mosaic block
# shapes must align with it, so the edge block is fixed at 1024 and callers
# pad edge streams to a multiple (packer default edge_pad_multiple=1024).
EDGE_BLOCK = 1024


def _lane_padded_bytes(n: int, f: int) -> int:
    fpad = -(-f // _LANES) * _LANES
    return n * fpad * 4


def spmm_pallas_fits(num_nodes: int, num_features: int, num_edges: int = EDGE_BLOCK) -> bool:
    return (
        2 * _lane_padded_bytes(num_nodes, num_features) <= _VMEM_BUDGET
        and num_edges % EDGE_BLOCK == 0
    )


def _edge_block(num_edges: int) -> int:
    return EDGE_BLOCK if num_edges % EDGE_BLOCK == 0 else 0


def _spmm_kernel(src_ref, dst_ref, w_ref, h_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    eb = src_ref.shape[0]
    f = h_ref.shape[1]

    def body(j, carry):
        acc, cur_d = carry
        s = src_ref[j]
        d = dst_ref[j]
        w = w_ref[j]
        row = h_ref[pl.ds(s, 1), :] * w

        # destination changed → flush the running accumulator
        @pl.when(d != cur_d)
        def _():
            out_ref[pl.ds(cur_d, 1), :] += acc

        acc = jnp.where(d != cur_d, row, acc + row)
        return acc, d

    # start with a zero accumulator aimed at the first edge's destination
    d0 = dst_ref[0]
    acc0 = jnp.zeros((1, f), dtype=out_ref.dtype)
    acc, last_d = jax.lax.fori_loop(0, eb, body, (acc0, d0))
    out_ref[pl.ds(last_d, 1), :] += acc


def _spmm_forward(edge_src, edge_dst, edge_weight, h, interpret=False):
    n, f = h.shape
    e = edge_src.shape[0]
    eb = _edge_block(e)
    if eb == 0:
        raise ValueError(f"edge count {e} not a multiple of {EDGE_BLOCK}")

    return pl.pallas_call(
        _spmm_kernel,
        grid=(e // eb,),
        in_specs=[
            pl.BlockSpec((eb,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((eb,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((eb,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), h.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * f,
            bytes_accessed=_lane_padded_bytes(n, f) * 2 + e * 12,
            transcendentals=0,
        ),
    )(edge_src, edge_dst, edge_weight, h)


def _spmm_mxu_kernel(src_ref, dst_ref, w_ref, h_ref, out_ref):
    """MXU SpMM: per edge block, build one-hot selectors IN VMEM (iota
    compare — no HBM selector traffic, the failure mode of the XLA-level
    one-hot formulation) and run gather+scatter as two matmuls:

        out += OneHot(dst)ᵀ @ (w ⊙ (OneHot(src) @ h))
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    eb = src_ref.shape[0]
    n = h_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (eb, n), 1)
    # src/dst/w live in VMEM as (eb, 1) columns → broadcast against iota
    sel_src = (src_ref[:] == iota).astype(jnp.float32)
    gathered = jnp.dot(sel_src, h_ref[:], preferred_element_type=jnp.float32)
    gathered = gathered * w_ref[:].reshape(eb, 1)
    sel_dst = (dst_ref[:] == iota).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        sel_dst, gathered, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# MXU-kernel edge block: small enough that two (EB, N) selector tiles fit
# VMEM beside h/out at the node counts the dispatcher allows.
MXU_EDGE_BLOCK = 256


def spmm_pallas_mxu_fits(num_nodes: int, num_features: int, num_edges: int) -> bool:
    sel_bytes = 2 * MXU_EDGE_BLOCK * num_nodes * 4
    return (
        num_edges % MXU_EDGE_BLOCK == 0
        and sel_bytes + 2 * _lane_padded_bytes(num_nodes, num_features)
        <= _VMEM_BUDGET
    )


def _spmm_mxu_forward(edge_src, edge_dst, edge_weight, h, interpret=False):
    n, f = h.shape
    e = edge_src.shape[0]
    eb = MXU_EDGE_BLOCK
    if e % eb:
        raise ValueError(f"edge count {e} not a multiple of {eb}")

    # index/weight streams as (E, 1) columns so blocks are 2-D VMEM tiles
    col = lambda a: a.reshape(e, 1)
    return pl.pallas_call(
        _spmm_mxu_kernel,
        grid=(e // eb,),
        in_specs=[
            pl.BlockSpec((eb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), h.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e * n * f,
            bytes_accessed=_lane_padded_bytes(n, f) * 2 + e * 12,
            transcendentals=0,
        ),
    )(col(edge_src), col(edge_dst), col(edge_weight), h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_pallas_mxu(edge_src, edge_dst, edge_weight, h, interpret=False):
    """MXU one-hot SpMM; same contract as `spmm_pallas`."""
    return _spmm_mxu_forward(edge_src, edge_dst, edge_weight, h, interpret)


def _mxu_fwd(edge_src, edge_dst, edge_weight, h, interpret):
    out = _spmm_mxu_forward(edge_src, edge_dst, edge_weight, h, interpret)
    return out, (edge_src, edge_dst, edge_weight, h)


def _mxu_bwd(interpret, res, g):
    edge_src, edge_dst, edge_weight, h = res
    dh = _spmm_mxu_forward(edge_dst, edge_src, edge_weight, g, interpret)
    dw = _sddmm_xla(edge_src, edge_dst, h, g)
    return None, None, dw, dh


spmm_pallas_mxu.defvjp(_mxu_fwd, _mxu_bwd)


def _sddmm_xla(edge_src, edge_dst, a, b):
    """Weight cotangent ⟨a[src], b[dst]⟩ via the ops-level SDDMM dispatcher
    (one-hot MXU matmuls where profitable, gather fallback otherwise)."""
    from dgcnn_tpu.ops.spmm import sddmm

    return sddmm(edge_src, edge_dst, a, b, impl="auto")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_pallas(edge_src, edge_dst, edge_weight, h, interpret=False):
    """out[i] = Σ_{e: dst[e]==i} w[e]·h[src[e]], shapes [E],[E],[E],[N,F]→[N,F]."""
    return _spmm_forward(edge_src, edge_dst, edge_weight, h, interpret)


def _fwd(edge_src, edge_dst, edge_weight, h, interpret):
    out = _spmm_forward(edge_src, edge_dst, edge_weight, h, interpret)
    return out, (edge_src, edge_dst, edge_weight, h)


def _bwd(interpret, res, g):
    edge_src, edge_dst, edge_weight, h = res
    # transpose: swap src/dst (padding edges carry w=0, so their scatter
    # target — row 0 after the swap — receives exactly 0)
    dh = _spmm_forward(edge_dst, edge_src, edge_weight, g, interpret)
    dw = _sddmm_xla(edge_src, edge_dst, h, g)
    return None, None, dw, dh


spmm_pallas.defvjp(_fwd, _bwd)
