"""VMEM-resident Pallas kernel for the block-sparse GCN propagation.

Round-5 redesign of kernels/block_pallas.py, built from its measured
failure modes on DD (RESULTS.md round-3: "block_impl=pallas on DD" —
a loser vs the chunked XLA formulation):

  * the old kernel pads the feature axis to the 128 lane tile, so at the
    trunk's F=32 (and F=1 on layer 4!) every hb DMA and every MXU dot
    moves/computes 4-128x the useful data;
  * it re-DMAs a whole source block-row PER WORK ITEM with a manual
    two-slot pipeline (DMA-wait latency per item), although the entire
    hb fits VMEM ~30x over;
  * its grid runs over output rows whose item runs are short (~4) and
    uneven, leaving the pipeline mostly idle.

This kernel instead keeps BOTH the node features and the output
accumulator fully VMEM-resident (DD budgets: hb [nb*bs, 32] bf16
= 1.8 MB, out [(nb+1)*bs, 32] f32 = 3.6 MB, vs ~16 MB VMEM/core) and
streams ONLY the pool blocks: the grid runs over groups of G work
items, each group step reading G pool blocks through G independent
auto-pipelined BlockSpec streams whose index maps gather
`pool[item_pool[w]]` via scalar prefetch. Per step: G [bs,bs]x[bs,F]
MXU dots accumulated into the resident output at their destination
rows. The only HBM traffic per layer is the real pool bytes — the
speed-of-light floor of this op (SURVEY: torch-scatter hot kernel,
reference model.py:30-33).

Padded work items (item_pool = sentinel zero block, item_row = nb) add
exact zeros to the sentinel row; consecutive sentinel fetches hit the
same block index, which the pipeline does not re-DMA.

The backward runs the SAME kernel over the build-time col-major
traversal with transposed dots (`d_hb[c] += B_w^T @ g[r]`), exactly
like the XLA path's custom VJP; the pool is training-constant so no
adjacency cotangent is formed.

Equality with models.dgcnn.block_propagate is pinned by
tests/test_block_resident.py (fwd + grad, fp32 and bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# work items per grid step = parallel pool-block streams per step
_GROUP = 8


def _make_kernel(bs: int, transpose: bool, group: int):
    def kernel(*refs):
        # refs = (ip, row, col, hb_ref, blk_0..blk_{G-1}, out_ref)
        row_ref, col_ref = refs[1], refs[2]
        hb_ref = refs[3]
        blks = refs[4 : 4 + group]
        out_ref = refs[4 + group]
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        for j in range(group):
            w = g * group + j
            r = pl.multiple_of(row_ref[w] * bs, bs)
            c = pl.multiple_of(col_ref[w] * bs, bs)
            a = blks[j][0]  # [bs, bs] pool block (bf16/f32/int8 storage)
            b = hb_ref[pl.ds(c, bs), :]  # [bs, F]
            a = a.astype(b.dtype)
            if transpose:
                dims = (((0,), (0,)), ((), ()))
            else:
                dims = (((1,), (0,)), ((), ()))
            part = jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32
            )
            out_ref[pl.ds(r, bs), :] += part

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nb", "transpose", "interpret")
)
def _prop_resident(pool, hb2, ip, row, col, *, nb, transpose=False,
                   interpret=False):
    """pallas_call wrapper: hb2 [nb*bs, F] resident; out [(nb+1)*bs, F]
    fp32 (row nb collects the padded items' zeros; caller slices it
    off). `ip/row/col` are the full [W] item lists, W % _GROUP == 0."""
    bs = pool.shape[1]
    f = hb2.shape[1]
    w = ip.shape[0]
    group = _GROUP
    assert w % group == 0, (w, group)

    def blk_spec(j):
        return pl.BlockSpec(
            (1, bs, bs),
            # index map sees (grid idx, *scalar prefetch refs)
            lambda g, ip_ref, row_ref, col_ref, j=j: (
                ip_ref[g * group + j], 0, 0
            ),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(w // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]  # hb resident
        + [blk_spec(j) for j in range(group)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # out resident
    )

    # under shard_map the output varies over whatever mesh axes the
    # operands vary over (same pcast lifting as kernels/block_pallas.py)
    vma = frozenset().union(
        *(jax.typeof(a).vma for a in (hb2, pool, ip, row, col))
    )

    def up(a):
        need = tuple(vma - jax.typeof(a).vma)
        return jax.lax.pcast(a, need, to="varying") if need else a

    pool, hb2, ip, row, col = map(up, (pool, hb2, ip, row, col))
    return pl.pallas_call(
        _make_kernel(bs, transpose, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            ((nb + 1) * bs, f), jnp.float32, vma=vma
        ),
        interpret=interpret,
    )(ip, row, col, hb2, *([pool] * group))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def block_propagate_resident(
    hb: jax.Array,  # [nb, bs, F] node features as block-rows
    pool: jax.Array,  # [P+1, bs, bs] adjacency block pool (row P = zeros)
    item_pool: jax.Array,  # [W] pool index per work item (P when padded)
    item_row: jax.Array,  # [W] destination block-row (nb when padded)
    item_col: jax.Array,  # [W] source block-row (0 when padded)
    item_permT: jax.Array,  # [W] col-major traversal (block_sparse.py)
    item_colT: jax.Array,  # [W] its segment ids (nb when padded)
    interpret: bool = False,
) -> jax.Array:
    """Fused `out[r] = Σ_w pool[ip_w] @ hb[c_w]` (fp32 out) — drop-in
    for models.dgcnn.block_propagate with hb and the accumulator
    VMEM-resident; HBM traffic = the pool block stream only."""
    nb, bs, f = hb.shape
    w = item_pool.shape[0]
    pad = (-w) % _GROUP
    if pad:
        sent = pool.shape[0] - 1
        item_pool = jnp.concatenate(
            [item_pool, jnp.full((pad,), sent, item_pool.dtype)]
        )
        item_row = jnp.concatenate(
            [item_row, jnp.full((pad,), nb, item_row.dtype)]
        )
        item_col = jnp.concatenate(
            [item_col, jnp.zeros((pad,), item_col.dtype)]
        )
    out = _prop_resident(
        pool, hb.reshape(nb * bs, f), item_pool, item_row, item_col,
        nb=nb, interpret=interpret,
    )
    return out[: nb * bs].reshape(nb, bs, f)


def _fwd(hb, pool, item_pool, item_row, item_col, item_permT, item_colT,
         interpret):
    out = block_propagate_resident(
        hb, pool, item_pool, item_row, item_col, item_permT, item_colT,
        interpret,
    )
    stub = jnp.zeros((0,), hb.dtype)
    return out, (pool, item_pool, item_row, item_permT, item_colT, stub)


def _bwd(interpret, res, g):
    pool, item_pool, item_row, item_permT, item_colT, stub = res
    nb, bs, f = g.shape
    # col-major traversal: padded items map (via identity permT) to the
    # padded tail: sentinel zero pool block, source row nb (the zero
    # sentinel row appended to g below), dest row nb (sliced off)
    ipT = item_pool[item_permT]
    rT = item_row[item_permT].astype(jnp.int32)
    # bf16-stored pools keep the backward stream at storage width;
    # int8 pools compute at the forward's hb dtype
    gdt = (
        pool.dtype if pool.dtype == jnp.bfloat16
        else stub.dtype if pool.dtype == jnp.int8
        else g.dtype
    )
    g2 = jnp.concatenate(
        [g.reshape(nb * bs, f).astype(gdt),
         jnp.zeros((bs, f), gdt)]
    )
    w = ipT.shape[0]
    pad = (-w) % _GROUP
    if pad:
        sent = pool.shape[0] - 1
        ipT = jnp.concatenate([ipT, jnp.full((pad,), sent, ipT.dtype)])
        rT = jnp.concatenate([rT, jnp.full((pad,), nb, rT.dtype)])
        item_colT = jnp.concatenate(
            [item_colT, jnp.full((pad,), nb, item_colT.dtype)]
        )
    out = _prop_resident(
        pool, g2, ipT, item_colT.astype(jnp.int32), rT,
        nb=nb, transpose=True, interpret=interpret,
    )
    d_hb = out[: nb * bs].reshape(nb, bs, f)
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


block_propagate_resident.defvjp(_fwd, _bwd)
