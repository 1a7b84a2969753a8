"""Fused Pallas block propagation (kernels/block_pallas.py) vs the XLA
block path (models/dgcnn.py block_propagate) — forward and gradient
equality on assembled BlockBatches, including padded work items, padded
(unvisited) block-rows, and the bf16-stored-pool mode. Runs the kernel in
interpret mode (CPU test mesh); the compiled path is exercised on
hardware by tools/profile_block_step.py --block_impl pallas."""

import numpy as np

import jax
import jax.numpy as jnp

from dgcnn_tpu.batching.block_sparse import (
    block_batch_extents,
    build_block_graphset,
    gather_block_batch,
)
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.kernels.block_pallas import block_propagate_pallas
from dgcnn_tpu.models.dgcnn import block_propagate


def _batch_and_inputs(seed=0, n_graphs=24, slots=8, f=13, pad_nb=5, pad_w=17):
    gs = synthesize_tu_dataset("DD", num_graphs=n_graphs, seed=seed)
    dev = build_block_graphset(gs)
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n_graphs)[: slots - 2]
    idx_row = np.full(slots, -1, np.int32)
    idx_row[: len(ids)] = ids
    nb, w = block_batch_extents(
        dev.nb.astype(np.int64), dev.block_count.astype(np.int64),
        idx_row[None],
    )
    # leave real headroom so padded items and unvisited block-rows exist
    devj = jax.tree_util.tree_map(jnp.asarray, dev)
    batch = gather_block_batch(
        devj, jnp.asarray(idx_row), nb + pad_nb, w + pad_w
    )
    bs = dev.pool.shape[1]
    hb = jnp.asarray(
        rng.standard_normal((nb + pad_nb, bs, f)).astype(np.float32)
    )
    return devj, batch, hb


def _xla_out(dev, batch, hb):
    blocks = dev.pool[batch.item_pool]
    return block_propagate(
        hb, blocks, batch.item_row, batch.item_col,
        batch.item_permT, batch.item_colT,
    )


def _pallas_out(dev, batch, hb):
    return block_propagate_pallas(
        hb, dev.pool, batch.item_pool, batch.item_row,
        batch.item_col, batch.item_permT, batch.item_colT, True,
    )


def test_forward_matches_xla_block_path():
    dev, batch, hb = _batch_and_inputs(seed=0)
    ref = _xla_out(dev, batch, hb)
    out = _pallas_out(dev, batch, hb)
    # unvisited block-rows: XLA's segment_sum yields exact zeros there and
    # the pallas kernel writes zeros — both must agree everywhere
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_forward_zeroes_unvisited_rows():
    dev, batch, hb = _batch_and_inputs(seed=1)
    out = np.asarray(_pallas_out(dev, batch, hb))
    dead = ~(np.asarray(batch.node_mask).reshape(hb.shape[0], -1).max(1) > 0)
    assert dead.any(), "fixture must leave unvisited block-rows"
    assert np.all(out[dead] == 0.0)
    assert np.all(np.isfinite(out))


def test_gradient_matches_xla_block_path():
    dev, batch, hb = _batch_and_inputs(seed=2, f=5)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(hb.shape).astype(np.float32)
    )

    def loss_ref(h):
        return jnp.vdot(_xla_out(dev, batch, h), cot)

    def loss_pal(h):
        return jnp.vdot(_pallas_out(dev, batch, h), cot)

    g_ref = jax.grad(loss_ref)(hb)
    g_pal = jax.grad(loss_pal)(hb)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_no_padded_items_or_rows():
    # exact budgets: every work item real, every block-row visited
    dev, batch, hb = _batch_and_inputs(seed=4, f=7, pad_nb=0, pad_w=0)
    np.testing.assert_allclose(
        np.asarray(_pallas_out(dev, batch, hb)),
        np.asarray(_xla_out(dev, batch, hb)),
        rtol=1e-6, atol=1e-6,
    )


def test_bf16_pool_matches_xla_bf16_path():
    dev, batch, hb = _batch_and_inputs(seed=3, f=4)
    pool16 = dev.pool.astype(jnp.bfloat16)
    hb16 = hb.astype(jnp.bfloat16)

    blocks16 = pool16[batch.item_pool]
    ref = block_propagate(
        hb16, blocks16, batch.item_row, batch.item_col,
        batch.item_permT, batch.item_colT,
    )
    out = block_propagate_pallas(
        hb16, pool16, batch.item_pool, batch.item_row, batch.item_col,
        batch.item_permT, batch.item_colT, True,
    )
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-6, atol=1e-6,
    )


def test_bf16_pool_gradient_matches_xla_bf16_path():
    """Backward with a bf16-stored pool: the kernel's transpose pass reads
    the pool at storage width and rounds the cotangent to bf16 (gdt cast)
    exactly like the XLA custom VJP's bdt cast — gradients must agree."""
    dev, batch, hb = _batch_and_inputs(seed=6, f=5)
    pool16 = dev.pool.astype(jnp.bfloat16)
    cot = jnp.asarray(
        np.random.default_rng(11).standard_normal(hb.shape).astype(np.float32)
    )

    def loss_ref(h):
        blocks16 = pool16[batch.item_pool]
        out = block_propagate(
            h.astype(jnp.bfloat16), blocks16, batch.item_row, batch.item_col,
            batch.item_permT, batch.item_colT,
        )
        return jnp.vdot(out, cot)

    def loss_pal(h):
        out = block_propagate_pallas(
            h.astype(jnp.bfloat16), pool16, batch.item_pool, batch.item_row,
            batch.item_col, batch.item_permT, batch.item_colT, True,
        )
        return jnp.vdot(out, cot)

    g_ref = jax.grad(loss_ref)(hb)
    g_pal = jax.grad(loss_pal)(hb)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_apply_block_pallas_matches_xla_end_to_end():
    """Full model forward (4 GCN layers + sortpool + head) equality
    between block_impl variants on an assembled batch."""
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_block, init_params

    gs = synthesize_tu_dataset("DD", num_graphs=16, seed=5)
    dev = jax.tree_util.tree_map(jnp.asarray, build_block_graphset(gs))
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    idx = np.full(8, -1, np.int32)
    idx[:6] = np.arange(6)
    nb, w = block_batch_extents(
        np.asarray(dev.nb, np.int64), np.asarray(dev.block_count, np.int64),
        idx[None],
    )
    batch = gather_block_batch(dev, jnp.asarray(idx), nb + 3, w + 9)
    lp_x = apply_block(params, model, batch, dev.pool, block_impl="xla")
    lp_p = apply_block(params, model, batch, dev.pool, block_impl="pallas")
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_x),
                               rtol=1e-5, atol=1e-5)


def test_config_block_impl_resolution():
    from dgcnn_tpu.config import Config

    assert Config(data_type="DD").resolved_block_impl() == "xla"
    assert Config(data_type="DD", block_impl="pallas").resolved_block_impl() == "pallas"
    import pytest

    with pytest.raises(ValueError):
        Config(data_type="DD", block_impl="nope")
