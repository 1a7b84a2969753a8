"""Block-pair COO SpMM — a Pallas TPU kernel that exploits BOTH index
streams' block locality.

The round-1 kernels lost their A/Bs for structural reasons:

  * the per-edge gather kernel (spmm_pallas.py `_spmm_kernel`) serializes
    on scalar-driven row loads (~60 cycles/edge — the TPU has no hardware
    gather);
  * the one-hot formulations (ops/spmm.py `spmm_onehot`,
    `_spmm_mxu_kernel`) pay 4·N·F MXU FLOPs per edge — selector matrices
    span ALL N nodes, so cost grows with the node count even though each
    edge only ever touches one 128-row block on each side.

This kernel reduces the selector span from N to the 128-row block. The
host packer groups the dst-sorted edge stream by (dst-block r, src-block
c) pairs — amortized preprocessing, exactly like dst-sorting itself —
and pads each pair's run to EB-edge work items. Per item the kernel
builds the item's 128×128 dense adjacency block ON THE MXU from local
(dst%128, src%128) index rows (an iota compare — no HBM selector
traffic, no serial scatter):

    A_item[d, s] = Σ_e w_e·1[ld_e=d]·1[ls_e=s]   (two ops: masked-select
                                                  + one (BS,EB)×(BS,EB)ᵀ
                                                  contraction)
    acc[r]      += A_item @ h[c]                  ((BS,BS)×(BS,F) dot)

Per-edge cost is 2·BS·(EB+F)·BS/EB FLOPs — INDEPENDENT of N, vs the
one-hot path's 4·N·F. (The lower-FLOP re-association
`sel_dst_w @ (sel_srcᵀ @ h)` measured SLOWER — see _kernel.) On a real packed mega-batch (graphs contiguous →
near-block-diagonal adjacency, few pairs, full items) this is ~30× fewer
FLOPs at NCI1 scale; on an adversarial uniform-random graph the
block-pair structure degenerates (every (r,c) pair occupied, items
mostly padding) and the dispatcher's one-hot path stays the right
choice — `ops/spmm.py` gates on the structure's measured fill.

The grid runs over output block-rows (one visit per output block — the
revisited-output pitfall kernels/block_pallas.py documents); each step
walks its contiguous run of items from a scalar-prefetched row-pointer
table. `h` stays VMEM-resident for the whole kernel (the dispatcher
gates on fit); index/weight streams live in VMEM as [W, EB] tiles.

Backward: dh = SpMMᵀ — the SAME kernel over the transpose structure
(roles of src/dst swapped, items grouped by source block, built by the
same host pass); dw = per-slot SDDMM on the padded global index streams.

Capability parity: torch-scatter's `scatter_add` inside PyG GCNConv
propagation (reference model.py:30-33, install at reference
README.md:17).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128          # node block size (MXU tile)
# edges per work item (lane-tile multiple). On-chip sweep (2026-08-19,
# NCI1-shaped batch): eb=128 and 256 time equal within transport noise,
# eb=512 ~2x slower (fill drops 0.58 -> 0.41 — padding waste dominates).
DEFAULT_EB = 256

_VMEM_BUDGET = 12 * 1024 * 1024
_LANES = 128


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class BlockCOOMeta:
    """Static shape/meta of a BlockCOO structure (pytree-static — anything
    here retraces the consuming jit when it changes, so only pack-bucket
    constants belong; null slots are marked with perm = −1 sentinels, NOT
    with a per-batch edge count)."""

    num_nodes: int
    num_edges: int   # original (unpadded) edge count — informational
    eb: int
    fill: float      # real edges / padded slots — dispatcher quality gate


@dataclasses.dataclass(frozen=True)
class BlockCOO:
    """Device-ready block-pair structure for one packed batch (both
    orientations). All arrays int32; [W, EB] streams are slot-major."""

    meta: BlockCOOMeta
    # forward orientation: items grouped by destination block (r-major)
    row_ptr: jax.Array   # [NB+1] item ranges per output block-row
    item_r: jax.Array    # [W] destination block per item (non-decreasing)
    item_c: jax.Array    # [W] source block per item
    ls: jax.Array        # [W, EB] src % BS
    ld: jax.Array        # [W, EB] dst % BS
    perm: jax.Array      # [W, EB] original edge index (−1 if null slot)
    # transpose orientation (for dh): items grouped by SOURCE block
    row_ptrT: jax.Array  # [NB+1]
    item_cT: jax.Array   # [WT] — destination block per transpose item
    lsT: jax.Array       # [WT, EB] dst % BS  (transpose "src")
    ldT: jax.Array       # [WT, EB] src % BS  (transpose "dst")
    permT: jax.Array     # [WT, EB] original edge index (−1 if null slot)


jax.tree_util.register_dataclass(
    BlockCOO,
    data_fields=[
        "row_ptr", "item_r", "item_c", "ls", "ld", "perm",
        "row_ptrT", "item_cT", "lsT", "ldT", "permT",
    ],
    meta_fields=["meta"],
)


def _build_orientation(
    major: np.ndarray, minor: np.ndarray, num_nodes: int, eb: int
) -> Tuple[np.ndarray, ...]:
    """Group edges by (major//BS, minor//BS), chunk each group into
    EB-slot items. Returns (row_ptr, item_r, item_c, l_minor, l_major,
    perm)."""
    e = major.shape[0]
    nb = num_nodes // BS
    r = major // BS
    c = minor // BS
    key = r.astype(np.int64) * nb + c
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    # run starts of each (r, c) group
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]]) if e else \
        np.zeros(0, np.int64)
    ends = np.r_[starts[1:], e] if e else np.zeros(0, np.int64)
    items_per = -(-(ends - starts) // eb) if e else np.zeros(0, np.int64)
    w = int(items_per.sum()) if e else 0
    w = max(w, 1)  # at least one (all-null) item keeps shapes non-empty

    perm = np.full((w, eb), -1, np.int64)
    item_r = np.zeros(w, np.int32)
    item_c = np.zeros(w, np.int32)
    wi = 0
    for g in range(starts.shape[0]):
        s0, s1 = int(starts[g]), int(ends[g])
        gr = int(key_s[s0] // nb)
        gc = int(key_s[s0] % nb)
        for off in range(s0, s1, eb):
            chunk = order[off: min(off + eb, s1)]
            perm[wi, : chunk.shape[0]] = chunk
            item_r[wi] = gr
            item_c[wi] = gc
            wi += 1

    null = perm < 0
    safe = np.maximum(perm, 0)
    lmaj = np.where(null, 0, major[safe] % BS) if e else np.zeros_like(perm)
    lmin = np.where(null, 0, minor[safe] % BS) if e else np.zeros_like(perm)
    row_ptr = np.searchsorted(item_r, np.arange(nb + 1)).astype(np.int32)
    return (
        row_ptr,
        item_r.astype(np.int32),
        item_c.astype(np.int32),
        lmin.astype(np.int32),
        lmaj.astype(np.int32),
        perm,
    )


def _pad_items(arrs, w_target: int, nb: int):
    """Pad (item_r, item_c, ls, ld, perm) to `w_target` items with
    sentinel items (r = nb → outside every row_ptr range, never read)."""
    item_r, item_c, ls, ld, perm = arrs
    w, eb = perm.shape
    if w_target < w:
        raise ValueError(f"pad_items_to={w_target} < actual items {w}")
    pad = w_target - w
    if pad == 0:
        return arrs
    return (
        np.r_[item_r, np.full(pad, nb, np.int32)],
        np.r_[item_c, np.zeros(pad, np.int32)],
        np.r_[ls, np.zeros((pad, eb), np.int32)],
        np.r_[ld, np.zeros((pad, eb), np.int32)],
        np.r_[perm, np.full((pad, eb), -1, np.int64)],
    )


def pad_structure(s: BlockCOO, w_target: int) -> BlockCOO:
    """Pad BOTH orientations' item axes of an existing structure to
    `w_target` (sentinel items, never read) — for stacking per-batch
    structures into one scanned epoch pytree."""
    nb = s.meta.num_nodes // BS
    r, c, ls, ld, perm = _pad_items(
        tuple(np.asarray(a) for a in (s.item_r, s.item_c, s.ls, s.ld, s.perm)),
        w_target, nb,
    )
    _, cT, lsT, ldT, permT = _pad_items(
        (
            np.full(np.asarray(s.item_cT).shape[0], 0, np.int32),
            np.asarray(s.item_cT), np.asarray(s.lsT), np.asarray(s.ldT),
            np.asarray(s.permT),
        ),
        w_target, nb,
    )
    return BlockCOO(
        meta=s.meta,
        row_ptr=s.row_ptr, item_r=jnp.asarray(r), item_c=jnp.asarray(c),
        ls=jnp.asarray(ls), ld=jnp.asarray(ld),
        perm=jnp.asarray(perm.astype(np.int32)),
        row_ptrT=s.row_ptrT, item_cT=jnp.asarray(cT),
        lsT=jnp.asarray(lsT), ldT=jnp.asarray(ldT),
        permT=jnp.asarray(permT.astype(np.int32)),
    )


def build_block_coo(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_nodes: int,
    eb: int = DEFAULT_EB,
    pad_items_to: int = 0,
) -> BlockCOO:
    """Host-side structure build (NumPy; once per packed batch — amortized
    across layers × fwd/bwd × epochs exactly like the packer's
    dst-sorting). `num_nodes` must be a BS multiple (packer
    node_pad_multiple=256 guarantees it). `pad_items_to` pads BOTH
    orientations' item axes to a fixed W (sentinel items, never read) so
    per-batch structures stack into one scanned epoch pytree."""
    if num_nodes % BS:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of {BS}")
    if eb % _LANES:
        raise ValueError(f"eb {eb} not a multiple of {_LANES}")
    src = np.asarray(edge_src, np.int64)
    dst = np.asarray(edge_dst, np.int64)
    e = src.shape[0]
    nb = num_nodes // BS

    row_ptr, item_r, item_c, ls, ld, perm = _build_orientation(
        dst, src, num_nodes, eb
    )
    row_ptrT, item_rT, item_cT, lsT, ldT, permT = _build_orientation(
        src, dst, num_nodes, eb
    )
    fill = e / float(max(perm.size, 1))
    if pad_items_to:
        item_r, item_c, ls, ld, perm = _pad_items(
            (item_r, item_c, ls, ld, perm), pad_items_to, nb
        )
        item_rT, item_cT, lsT, ldT, permT = _pad_items(
            (item_rT, item_cT, lsT, ldT, permT), pad_items_to, nb
        )
    return BlockCOO(
        meta=BlockCOOMeta(num_nodes=num_nodes, num_edges=e, eb=eb, fill=fill),
        row_ptr=jnp.asarray(row_ptr),
        item_r=jnp.asarray(item_r),
        item_c=jnp.asarray(item_c),
        ls=jnp.asarray(ls),
        ld=jnp.asarray(ld),
        perm=jnp.asarray(perm.astype(np.int32)),
        row_ptrT=jnp.asarray(row_ptrT),
        item_cT=jnp.asarray(item_cT),
        lsT=jnp.asarray(lsT),
        ldT=jnp.asarray(ldT),
        permT=jnp.asarray(permT.astype(np.int32)),
    )


def pad_weights(structure: BlockCOO, w: np.ndarray) -> np.ndarray:
    """Host helper: original edge weights → forward slot order [W, EB]
    (null slots 0). For static weights (the packer's edge mask) this runs
    once at pack time; zero per-step cost."""
    return _pad_w(np.asarray(structure.perm), w)


def pad_weights_t(structure: BlockCOO, w: np.ndarray) -> np.ndarray:
    """Transpose-orientation twin of `pad_weights`."""
    return _pad_w(np.asarray(structure.permT), w)


def _pad_w(perm: np.ndarray, w: np.ndarray) -> np.ndarray:
    w = np.asarray(w, np.float32)
    if w.size == 0:
        return np.zeros(perm.shape, np.float32)
    return np.where(perm < 0, 0.0, w[np.maximum(perm, 0)])


def block_coo_fits(num_nodes: int, num_features: int, w: int, eb: int) -> bool:
    """VMEM residency gate: h + out block + N_ACC accs + 3 [W, EB]
    streams."""
    fpad = -(-num_features // _LANES) * _LANES
    h_bytes = num_nodes * fpad * 4
    stream_bytes = 3 * w * eb * 4
    return (
        h_bytes + (1 + N_ACC) * BS * fpad * 4 + stream_bytes <= _VMEM_BUDGET
    )


# independent accumulators = software pipeline depth over the per-item
# dependent dot pair (A-build → A@h). 2-deep measured ~1.6× over 1 on
# v5e at eb=512 (round 1). Round 3 A/B'd 4-deep
# (tools/probe_kernel_anatomy.py, two runs + bench rows): measured a
# 1.55× win under host contention, ~1.26× on one quiet bench pass
# (11.0 → 9.94 µs/op auto), and EQUAL-within-noise on a later bracketed
# run — day-long transport variance swung identical-code rows 6-17
# µs/op, so the honest verdict is NEUTRAL-TO-POSITIVE; kept at 4
# because it never measured worse. 8-deep consistently LOST (~20 µs/op,
# both orders — register/VMEM pressure); do not re-try. What IS robust
# across every run: the round-2 "VPU selector builds dominate"
# hypothesis is REFUTED (sel_const ≈ base) and the A-build contraction
# dominates kernel time (no_abuild cuts most of it) — the residual gap
# to the MXU peak is that contraction's small-matmul issue/drain
# overhead at (128,256)×(256,128) granularity, not a schedulable stall
# (no DMA exists to overlap — all streams are VMEM-resident).
N_ACC = 4


def _kernel(rp_ref, ic_ref, ls_ref, ld_ref, w_ref, h_ref, out_ref, *accs):
    """Per output block-row r: walk its item run, N_ACC items per loop
    iteration into N_ACC independent accumulators (hides the per-item
    A-build → A@h dependence — see N_ACC note above).

    Cost anatomy (re-measured 2026-08-20, NCI1-shaped batch,
    tools/probe_kernel_anatomy.py): the A-build contraction dominates
    (~80% of kernel time); selector builds are ~free (VPU overlaps);
    the A@h dot adds ~0.5 MXU cycles/slot at F=32. Compute floor ≈
    1-2 cycles per padded edge slot, independent of N — vs the one-hot
    formulation's 4·N·F FLOPs per edge (ops/spmm.py)."""
    r = pl.program_id(0)
    start = rp_ref[r]
    n = rp_ref[r + 1] - start
    n_acc = len(accs)
    for a in accs:
        a[...] = jnp.zeros_like(a)
    eb = ls_ref.shape[1]
    # row ids of the 128-row block, broadcast against the (1, EB) streams
    iota = jax.lax.broadcasted_iota(jnp.int32, (BS, eb), 0)

    def item(j, which):
        c = ic_ref[j]
        ls = ls_ref[pl.ds(j, 1), :]          # (1, EB) src % BS
        ld = ld_ref[pl.ds(j, 1), :]          # (1, EB) dst % BS
        w = w_ref[pl.ds(j, 1), :]            # (1, EB)
        # A[d, s] = Σ_e w_e·1[ld_e=d]·1[ls_e=s]: mask w into the dst
        # selector rows, contract the edge axis against the src selector.
        # NOTE a re-association sel_dst_w @ (sel_srcᵀ @ h[c]) has 2.25×
        # fewer FLOPs at F=32 but MEASURED SLOWER on v5e (19.7 vs 14.5 µs,
        # 2026-08-19): both of its dots run at F/128 lane utilization,
        # while this order's dominant A-build contraction is full-width —
        # lane utilization beats FLOP count here.
        sel_dst_w = jnp.where(ld == iota, w, 0.0)               # (BS, EB)
        sel_src = (ls == iota).astype(jnp.float32)              # (BS, EB)
        a = jax.lax.dot_general(
            sel_dst_w, sel_src, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # (BS, BS)
        which[...] += jnp.dot(
            a.astype(h_ref.dtype), h_ref[c],
            preferred_element_type=jnp.float32,
        )

    def body(k, carry):
        j = start + n_acc * k
        item(j, accs[0])
        for t in range(1, n_acc):
            @pl.when(j + t < start + n)
            def _(t=t):
                item(j + t, accs[t])

        return carry

    jax.lax.fori_loop(0, (n + n_acc - 1) // n_acc, body, 0)
    total = accs[0][...]
    for a in accs[1:]:
        total = total + a[...]
    out_ref[0] = total.astype(out_ref.dtype)


def _forward(
    row_ptr, item_c, ls, ld, w_pad, h, *, interpret=False
):
    n, f = h.shape
    nb = n // BS
    wn, eb = ls.shape
    hb = h.reshape(nb, BS, f)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # row_ptr, item_c drive the item walk
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ls [W, EB]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ld [W, EB]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w  [W, EB]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hb [NB, BS, F]
        ],
        out_specs=pl.BlockSpec(
            (1, BS, f), lambda i, rp, ic: (i, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((BS, f), jnp.float32)] * N_ACC,
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, BS, f), h.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * wn * BS * (eb + f) * BS,
            bytes_accessed=2 * n * f * 4 + 3 * wn * eb * 4,
            transcendentals=0,
        ),
    )(row_ptr, item_c, ls, ld, w_pad, hb)
    return out.reshape(n, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def spmm_block_coo(
    structure: BlockCOO,
    w_pad: jax.Array,    # [W, EB] weights in forward slot order
    w_padT: jax.Array,   # [WT, EB] weights in transpose slot order
    h: jax.Array,        # [N, F]
    interpret: bool = False,
) -> jax.Array:
    """out[i] = Σ_{e: dst[e]==i} w[e]·h[src[e]] over the block-pair
    structure. Both weight layouts come from `pad_weights`/`pad_weights_t`
    (static per batch in the GCN use — the sym-norm runs as node-row
    scalings outside the spmm, ops/gcn.py). The primal reads only `w_pad`;
    `w_padT` rides along so the backward's SpMMᵀ needs no device-side
    re-permutation (its own cotangent is exactly zero)."""
    return _forward(
        structure.row_ptr, structure.item_c, structure.ls, structure.ld,
        w_pad, h, interpret=interpret,
    )


def _fwd(structure, w_pad, w_padT, h, interpret):
    out = _forward(
        structure.row_ptr, structure.item_c, structure.ls, structure.ld,
        w_pad, h, interpret=interpret,
    )
    return out, (structure, w_padT, h)


def _bwd(interpret, res, g):
    structure, w_padT, h = res
    # dh = SpMMᵀ: the same kernel over the source-grouped orientation
    dh = _forward(
        structure.row_ptrT, structure.item_cT, structure.lsT, structure.ldT,
        w_padT, g, interpret=interpret,
    )
    # dw per forward slot: ⟨h[src_e], g[dst_e]⟩. Null slots read row 0 on
    # both sides — their (nonzero) dots are masked to exact 0 below. The
    # GCN path never differentiates w (the mask is data), so this runs
    # only under explicit grad tests / exotic uses.
    gsrc = structure.item_c[:, None] * BS + structure.ls   # [W, EB] global
    gdst = structure.item_r[:, None] * BS + structure.ld
    from dgcnn_tpu.ops.spmm import sddmm

    dw = sddmm(gsrc.reshape(-1), gdst.reshape(-1), h, g, impl="xla")
    dw = jnp.where(structure.perm < 0, 0.0, dw.reshape(structure.ls.shape))

    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, dtype=f0)
    d_structure = BlockCOO(
        meta=structure.meta,
        row_ptr=zi(structure.row_ptr), item_r=zi(structure.item_r),
        item_c=zi(structure.item_c), ls=zi(structure.ls),
        ld=zi(structure.ld), perm=zi(structure.perm),
        row_ptrT=zi(structure.row_ptrT), item_cT=zi(structure.item_cT),
        lsT=zi(structure.lsT), ldT=zi(structure.ldT),
        permT=zi(structure.permT),
    )
    return (
        d_structure,
        dw.astype(w_padT.dtype),
        jnp.zeros_like(w_padT),  # primal never reads w_padT
        dh.astype(h.dtype),
    )


spmm_block_coo.defvjp(_fwd, _bwd)
