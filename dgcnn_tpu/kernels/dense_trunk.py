"""Fused dense GCN trunk — one Pallas kernel for the adjacency-coupled
core of all four GCN layers.

The dense layouts run the trunk as eight separate XLA einsums per step
(4 layers × fwd/bwd), each re-reading the gathered [S, T, T] adjacency
from HBM; at COLLAB scale that stream IS the step (~122 µs measured ≈
the SoL time of those bytes — RESULTS.md round-4 notes). One slot's
adjacency tile (256²·bf16 = 128 KB) fits VMEM with room to spare, so
this kernel grids over slots and keeps the tile RESIDENT across all
four layers: adjacency reads drop 4× per direction.

Decomposition: the first layer's feature matmul (x @ W1) and its
cotangents stay OUTSIDE in XLA (x can be 1..90 features wide — lane
padding it through the kernel would cost more than it saves, and JAX
autodiff handles d_W1/d_x through the einsum once d_hw1 flows out of
the custom VJP). The kernel consumes hw1 = x @ W1 and owns everything
the adjacency touches:

    h_1 = tanh(adj @ hw1 + b_1) · mask
    h_i = tanh(adj @ (h_{i-1} @ W_i) + b_i) · mask        i = 2..L
    cat = [h_1 ‖ … ‖ h_L]                  (lane-padded to 128)

The backward re-walks the chain with the SAME resident tile, using the
GCN adjacency's symmetry (D̂^{-1/2}(A+I)D̂^{-1/2} of an undirected graph
⇒ adjᵀ = adj); per-slot weight/bias partials are segment-summed by
weight-set id outside (fold-lockstep passes per-slot weight ids via
scalar prefetch; single-weight callers pass zeros).

Numerics match models.dgcnn._dense_trunk: same dot chain, fp32
accumulation, bf16 adjacency operands when the tile is stored bf16.
Equality pinned in tests/test_dense_trunk.py (interpret mode, CPU).

Capability parity: the GCNConv stack of reference model.py:30-33.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# slots per grid step: G independent slot chains interleave their MXU
# dots (one-slot steps measured 2.7× slower than XLA's batched einsums
# on COLLAB — the serial agg→tanh→hw chain drains the MXU between
# small dots). VMEM: G·(tile + activations) must fit; G=4 at T=256 is
# ~0.6 MB of tiles.
_G = 4


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_slots(a: jax.Array, s_pad: int) -> jax.Array:
    pad = s_pad - a.shape[0]
    if pad == 0:
        return a
    widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths)


def _offsets(dims):
    return np.concatenate([[0], np.cumsum(dims)]).astype(int)


def _make_fwd_kernel(dims, g_slots):
    n_layers = len(dims)

    def kernel(wsel_ref, adj_ref, hw1_ref, mask_ref, *rest):
        ws = rest[: n_layers - 1]          # W2..WL, each [K, d_{i-1}, d_i]
        bs = rest[n_layers - 1 : 2 * n_layers - 1]  # b1..bL, each [K, 1, d]
        out_ref = rest[2 * n_layers - 1]
        base = pl.program_id(0) * g_slots
        # G independent slot chains interleaved per grid step: each
        # layer issues G independent MXU dots back-to-back (the serial
        # per-slot agg→tanh→hw chain otherwise leaves the MXU draining
        # between small dots — one-slot steps measured 2.7× slower than
        # XLA's batched einsums on COLLAB, 2026-08-21)
        ks = [wsel_ref[base + g] for g in range(g_slots)]
        hw = [
            hw1_ref[g][:, : dims[0]].astype(jnp.float32)
            for g in range(g_slots)
        ]
        hs = [[None] * g_slots for _ in range(n_layers)]
        for i in range(n_layers):
            aggs = [
                jnp.dot(
                    adj_ref[g], hw[g].astype(adj_ref.dtype),
                    preferred_element_type=jnp.float32,
                )
                for g in range(g_slots)
            ]
            for g in range(g_slots):
                hs[i][g] = jnp.tanh(
                    aggs[g] + bs[i][ks[g]][0]
                ) * mask_ref[g][:, :1]
            if i + 1 < n_layers:
                hw = [
                    jnp.dot(
                        hs[i][g], ws[i][ks[g]],
                        preferred_element_type=jnp.float32,
                    )
                    for g in range(g_slots)
                ]
        for g in range(g_slots):
            cat = jnp.concatenate([hs[i][g] for i in range(n_layers)], axis=1)
            pad = out_ref.shape[2] - cat.shape[1]
            if pad:
                cat = jnp.concatenate(
                    [cat, jnp.zeros((cat.shape[0], pad), cat.dtype)], axis=1
                )
            out_ref[g] = cat.astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(dims, g_slots):
    n_layers = len(dims)
    offs = _offsets(dims)

    def kernel(wsel_ref, adj_ref, mask_ref, cat_ref, g_ref, *rest):
        ws = rest[: n_layers - 1]
        dhw1_ref = rest[n_layers - 1]
        dw_refs = rest[n_layers : 2 * n_layers - 1]
        db_refs = rest[2 * n_layers - 1 :]
        base = pl.program_id(0) * g_slots
        ks = [wsel_ref[base + g] for g in range(g_slots)]
        cats = [cat_ref[g].astype(jnp.float32) for g in range(g_slots)]
        gs = [g_ref[g].astype(jnp.float32) for g in range(g_slots)]

        d_chain = [
            jnp.zeros((cats[0].shape[0], dims[-1]), jnp.float32)
            for _ in range(g_slots)
        ]
        for i in range(n_layers - 1, -1, -1):
            d_pre = [None] * g_slots
            for g in range(g_slots):
                h_i = cats[g][:, offs[i] : offs[i + 1]]
                d_hi = (
                    gs[g][:, offs[i] : offs[i + 1]] + d_chain[g]
                ) * mask_ref[g][:, :1]
                d_pre[g] = d_hi * (1.0 - h_i * h_i)
            # adjᵀ = adj: symmetric normalized adjacency; G independent
            # dots issue back-to-back
            d_hw = [
                jnp.dot(
                    adj_ref[g], d_pre[g].astype(adj_ref.dtype),
                    preferred_element_type=jnp.float32,
                )
                for g in range(g_slots)
            ]
            for g in range(g_slots):
                if i > 0:
                    h_prev = cats[g][:, offs[i - 1] : offs[i]]
                    dw_refs[i - 1][g] = jax.lax.dot_general(
                        h_prev, d_hw[g], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    d_chain[g] = jax.lax.dot_general(
                        d_hw[g], ws[i - 1][ks[g]].astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    d1 = d_hw[g]
                    pad = dhw1_ref.shape[2] - d1.shape[1]
                    if pad:
                        d1 = jnp.concatenate(
                            [d1, jnp.zeros((d1.shape[0], pad), d1.dtype)],
                            axis=1,
                        )
                    dhw1_ref[g] = d1.astype(dhw1_ref.dtype)
                db_refs[i][g, 0] = jnp.sum(d_pre[g], axis=0)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gcn_trunk_fused(dims, interpret, adj, hw1, mask, wsel, ws, bs):
    """cat [S, T, Σdims] — see module docstring.

    dims   static hidden widths, e.g. (32, 32, 32, 1)
    adj    [S, T, T] symmetric normalized adjacency (fp32 or bf16)
    hw1    [S, T, d1] = x @ W1 (computed outside; d1 may be lane-padded,
           extra columns ignored)
    mask   [S, T] node mask
    wsel   [S] int32 weight-set id (zeros when K == 1)
    ws     tuple of L−1 arrays [K, d_{i-1}, d_i] (W2..WL)
    bs     tuple of L arrays [K, d_i]
    """
    return _forward(dims, interpret, adj, hw1, mask, wsel, ws, bs)


def _prep(mask):
    s, t = mask.shape
    m = jnp.zeros((s, t, _LANES), mask.dtype)
    return m.at[:, :, 0].set(mask)


def _forward(dims, interpret, adj, hw1, mask, wsel, ws, bs):
    s, t, _ = adj.shape
    s_pad = _round_up(s, _G)
    cdim = int(sum(dims))
    cpad = _round_up(cdim, _LANES)
    adjp = _pad_slots(adj, s_pad)
    hw1p = _pad_slots(hw1, s_pad)
    maskp = _pad_slots(_prep(mask), s_pad)
    wselp = _pad_slots(wsel, s_pad)
    bs2 = tuple(b[:, None, :] for b in bs)
    n_layers = len(dims)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_pad // _G,),
        in_specs=[
            pl.BlockSpec((_G, t, t), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, t, hw1.shape[2]), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, t, _LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers - 1),
        out_specs=pl.BlockSpec((_G, t, cpad), lambda i, w: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_fwd_kernel(tuple(dims), _G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, t, cpad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * s * t * t * cdim,
            bytes_accessed=adj.size * adj.dtype.itemsize
            + hw1.size * 4 + s * t * cpad * 4,
            transcendentals=s * t * cdim,
        ),
    )(wselp, adjp, hw1p, maskp, *ws, *bs2)
    return out[:s, :, :cdim]


def _vjp_fwd(dims, interpret, adj, hw1, mask, wsel, ws, bs):
    cat = _forward(dims, interpret, adj, hw1, mask, wsel, ws, bs)
    return cat, (adj, hw1, mask, wsel, ws, bs, cat)


def _vjp_bwd(dims, interpret, res, g):
    adj, hw1, mask, wsel, ws, bs, cat = res
    s, t, _ = adj.shape
    s_pad = _round_up(s, _G)
    cdim = int(sum(dims))
    cpad = _round_up(cdim, _LANES)
    adjp = _pad_slots(adj, s_pad)
    maskp = _pad_slots(_prep(mask), s_pad)
    wselp = _pad_slots(wsel, s_pad)
    catp = _pad_slots(
        jnp.pad(cat, ((0, 0), (0, 0), (0, cpad - cdim))), s_pad
    )
    gp = _pad_slots(
        jnp.pad(g.astype(jnp.float32), ((0, 0), (0, 0), (0, cpad - cdim))),
        s_pad,
    )
    n_layers = len(dims)
    d1pad = hw1.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_pad // _G,),
        in_specs=[
            pl.BlockSpec((_G, t, t), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, t, _LANES), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, t, cpad), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, t, cpad), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_layers - 1),
        out_specs=[
            pl.BlockSpec((_G, t, d1pad), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((_G, int(din), int(dout)),
                         lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for din, dout in zip(dims[:-1], dims[1:])
        ]
        + [
            pl.BlockSpec((_G, 1, int(d)), lambda i, w: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for d in dims
        ],
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((s_pad, t, d1pad), jnp.float32)]
        + [
            jax.ShapeDtypeStruct((s_pad, int(din), int(dout)), jnp.float32)
            for din, dout in zip(dims[:-1], dims[1:])
        ]
        + [jax.ShapeDtypeStruct((s_pad, 1, int(d)), jnp.float32)
           for d in dims]
    )
    outs = pl.pallas_call(
        _make_bwd_kernel(tuple(dims), _G),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(wselp, adjp, maskp, catp, gp, *ws)
    d_hw1 = outs[0][:s]
    dws_slot = [o[:s] for o in outs[1:n_layers]]
    dbs_slot = [o[:s] for o in outs[n_layers:]]

    k = ws[0].shape[0] if ws else bs[0].shape[0]
    dws = tuple(
        jax.ops.segment_sum(dw, wsel, num_segments=k).astype(w.dtype)
        for dw, w in zip(dws_slot, ws)
    )
    dbs = tuple(
        jax.ops.segment_sum(db[:, 0], wsel, num_segments=k).astype(b.dtype)
        for db, b in zip(dbs_slot, bs)
    )
    f0 = jax.dtypes.float0
    return (
        jnp.zeros_like(adj),        # adjacency is data (normalization baked)
        d_hw1.astype(hw1.dtype),
        jnp.zeros_like(mask),
        np.zeros(wsel.shape, dtype=f0),
        dws,
        dbs,
    )


gcn_trunk_fused.defvjp(_vjp_fwd, _vjp_bwd)
