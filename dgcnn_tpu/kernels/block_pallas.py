"""Fused Pallas kernel for the block-sparse GCN propagation.

The XLA formulation (models/dgcnn.py block_propagate) runs, per layer:

    blocks = pool[item_pool]                      # [W, bs, bs] HBM gather
    parts  = einsum('wij,wjf->wif', blocks, hb[item_col])   # HBM round-trip
    out    = sorted segment_sum(parts, item_row)

This kernel fuses all three into ONE pass, CSR-style: the grid runs over
OUTPUT block-rows; each grid step walks its run of work items (item_row
is non-decreasing — batching/block_sparse.py sorts blocks (row, col) per
graph at build time — so a row's items are one contiguous range of a
scalar-prefetched row-pointer table), double-buffer-DMAs each item's pool
block `pool[item_pool[w]]` and source block-row `hb[item_col[w]]`
HBM→VMEM, multiplies on the MXU, and accumulates into a VMEM scratch
that is written to `out[row]` exactly once. Three HBM streams disappear
relative to XLA:

  * the materialized `[W, bs, bs]` gathered-blocks array (write + read,
    once per step at fp32 — the step's single largest stream);
  * the `[W, bs, F]` parts array (write + read, per layer, fwd and bwd);
  * the segment-sum pass re-reading those parts.

The grid is NOT the work-item axis with a revisited output block on
purpose: a data-dependent out index map that repeats across steps makes
the pipeline's write-back/prefetch order load-bearing (measured: dropped
accumulations). One visit per output block sidesteps that entirely, and
rows no work item touches (block-rows past the batch's last real graph)
write exact zeros — no caller-side masking needed. Padded work items
carry segment id ≥ nb (batching/block_sparse.py sentinels), so they fall
outside every row's pointer range and are never read.

The backward pass runs the SAME kernel over the build-time col-major item
traversal (`d_hb[c] += B_wᵀ @ g[r]`, segment ids `item_colT`
non-decreasing), exactly like the XLA path's custom VJP — the pool is
training-constant, so no adjacency cotangent is ever formed.

Capability parity: reference model.py:30-33 (torch-scatter aggregation),
re-expressed at 128×128-block granularity for the MXU. Equality with the
XLA block path (and hence the COO path) is pinned by
tests/test_block_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(transpose: bool):
    def kernel(rp_ref, ip_ref, ic_ref, pool_hbm, hb_hbm, out_ref,
               a_buf, b_buf, acc, sem_a, sem_b):
        i = pl.program_id(0)
        start = rp_ref[i]
        n = rp_ref[i + 1] - start
        acc[...] = jnp.zeros_like(acc)

        def dma_a(slot, j):
            return pltpu.make_async_copy(
                pool_hbm.at[ip_ref[j]], a_buf.at[slot], sem_a.at[slot]
            )

        def dma_b(slot, j):
            return pltpu.make_async_copy(
                hb_hbm.at[ic_ref[j]], b_buf.at[slot], sem_b.at[slot]
            )

        @pl.when(n > 0)
        def _():
            dma_a(0, start).start()
            dma_b(0, start).start()

        def body(k, carry):
            j = start + k
            slot = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < n)
            def _():
                dma_a(nxt, j + 1).start()
                dma_b(nxt, j + 1).start()

            dma_a(slot, j).wait()
            dma_b(slot, j).wait()
            dims = (((0,) if transpose else (1,), (0,)), ((), ()))
            acc[...] += jax.lax.dot_general(
                a_buf[slot], b_buf[slot], dims,
                preferred_element_type=jnp.float32,
            )
            return carry

        jax.lax.fori_loop(0, n, body, 0)
        out_ref[0] = acc[...]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nb", "transpose", "interpret")
)
def _prop_pallas(pool, hb, row_ptr, ip, ic, *, nb, transpose=False,
                 interpret=False):
    """CSR-style pallas_call: grid over `nb` output block-rows; row i owns
    work items [row_ptr[i], row_ptr[i+1]) of the (ip, ic) item lists."""
    # Mosaic requires the lane (minor) dim of sliced/DMA'd refs to be
    # tile-aligned: `hb.at[c]` on a 32-wide (or 1-wide, layer 4) feature
    # block fails real TPU compilation ("Slice shape along dimension 2
    # must be aligned to tiling (128)", observed on-chip 2026-08-18) even
    # though interpret mode accepts it. Pad F up to the 128 lane tile for
    # the kernel and slice the result back.
    f_in = hb.shape[2]
    f_pad = -(-f_in // 128) * 128
    if f_pad != f_in:
        hb = jnp.pad(hb, ((0, 0), (0, 0), (0, f_pad - f_in)))
    bs, f = pool.shape[1], hb.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pool stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # hb stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, bs, f), lambda i, rp, ip, ic: (i, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bs, bs), pool.dtype),
            pltpu.VMEM((2, bs, f), hb.dtype),
            pltpu.VMEM((bs, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # under shard_map (mesh engines) the output varies over whatever mesh
    # axes the inputs vary over — check_vma needs that declared on the out
    # shape, and every operand lifted to the same variance (the replicated
    # pool vs device-varying indices would otherwise trip the checker)
    vma = frozenset().union(
        *(jax.typeof(a).vma for a in (hb, pool, row_ptr, ip, ic))
    )

    def up(a):
        need = tuple(vma - jax.typeof(a).vma)
        return jax.lax.pcast(a, need, to="varying") if need else a

    pool, hb, row_ptr, ip, ic = map(up, (pool, hb, row_ptr, ip, ic))
    out = pl.pallas_call(
        _make_kernel(transpose),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, bs, f), jnp.float32, vma=vma),
        interpret=interpret,
    )(row_ptr, ip, ic, pool, hb)
    return out[:, :, :f_in] if f_pad != f_in else out


def _row_ptr(seg_ids, nb):
    """[nb+1] CSR pointers into a NON-DECREASING segment-id vector; ids
    ≥ nb (the batch sentinels on padded items) fall outside every range."""
    return jnp.searchsorted(
        seg_ids, jnp.arange(nb + 1, dtype=seg_ids.dtype), side="left"
    ).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def block_propagate_pallas(
    hb: jax.Array,  # [nb, bs, F] node features as block-rows
    pool: jax.Array,  # [P+1, bs, bs] adjacency block pool (row P = zeros)
    item_pool: jax.Array,  # [W] pool index per work item (P when padded)
    item_row: jax.Array,  # [W] destination block-row, non-decreasing
    item_col: jax.Array,  # [W] source block-row (0 when padded)
    item_permT: jax.Array,  # [W] col-major traversal (block_sparse.py)
    item_colT: jax.Array,  # [W] its segment ids, non-decreasing
    interpret: bool = False,
) -> jax.Array:
    """Fused `out[r] = Σ_w pool[ip_w] @ hb[c_w]` (fp32 out) — drop-in for
    models.dgcnn.block_propagate with the block gather folded in. Rows no
    item visits (and rows only padded items map to) come out exact zero,
    matching the XLA segment-sum."""
    nb = hb.shape[0]
    return _prop_pallas(
        pool, hb, _row_ptr(item_row, nb), item_pool, item_col,
        nb=nb, interpret=interpret,
    )


def _fwd(hb, pool, item_pool, item_row, item_col, item_permT, item_colT,
         interpret):
    out = block_propagate_pallas(
        hb, pool, item_pool, item_row, item_col, item_permT, item_colT,
        interpret,
    )
    stub = jnp.zeros((0,), hb.dtype)
    return out, (pool, item_pool, item_row, item_permT, item_colT, stub)


def _bwd(interpret, res, g):
    pool, item_pool, item_row, item_permT, item_colT, stub = res
    nb = g.shape[0]
    # col-major traversal: same sorted kernel, transposed blocks. Padded
    # items keep colT = nb_budget sentinels → outside every pointer range;
    # their row reads (item_row = nb_budget) are therefore never issued,
    # so g needs no sentinel padding. Source rows of REAL items are < nb.
    ipT = item_pool[item_permT]
    rT = jnp.minimum(item_row[item_permT], nb - 1).astype(jnp.int32)
    # bf16-stored pools keep the backward stream at storage width (the
    # cotangent rounds down — same MXU math as DEFAULT-precision fp32)
    gdt = pool.dtype if pool.dtype == jnp.bfloat16 else g.dtype
    d_hb = _prop_pallas(
        pool, g.astype(gdt), _row_ptr(item_colT, nb), ipT, rT,
        nb=nb, transpose=True, interpret=interpret,
    )
    f0 = jax.dtypes.float0
    zi = lambda a: np.zeros(a.shape, dtype=f0)
    return (
        d_hb.astype(stub.dtype),
        jnp.zeros_like(pool),  # pool is training-constant → DCE'd
        zi(item_pool),
        zi(item_row),
        zi(item_row),
        zi(item_permT),
        zi(item_colT),
    )


block_propagate_pallas.defvjp(_fwd, _bwd)
