"""VMEM-resident Pallas block propagation (kernels/block_resident.py):
forward and gradient equality with the XLA formulation on real
block-batch shapes (interpret mode on CPU; the real Mosaic compile is
covered by the on-chip smoke test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.batching.block_sparse import (
    block_batch_extents,
    build_block_graphset,
    gather_block_batch,
)
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.kernels.block_resident import block_propagate_resident
from dgcnn_tpu.models.dgcnn import block_propagate


def _fixture(seed=3, n_graphs=24, idx_n=10):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=n_graphs, seed=seed)
    dev = jax.tree_util.tree_map(jnp.asarray, build_block_graphset(gs))
    rng = np.random.default_rng(seed)
    idx = np.full(16, -1, np.int32)
    idx[:idx_n] = rng.permutation(n_graphs)[:idx_n]
    nb, w = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count), idx[None]
    )
    batch = gather_block_batch(dev, jnp.asarray(idx), nb + 2, w + 5)
    return dev, batch, nb + 2


def _ref(hb, dev, batch):
    return block_propagate(
        hb, dev.pool[batch.item_pool], batch.item_row, batch.item_col,
        batch.item_permT, batch.item_colT,
    )


def _got(hb, pool, batch):
    return block_propagate_resident(
        hb, pool, batch.item_pool, batch.item_row, batch.item_col,
        batch.item_permT, batch.item_colT, True,  # interpret on CPU
    )


@pytest.mark.parametrize("f", [32, 1])
def test_forward_matches_xla(f):
    dev, batch, nb = _fixture()
    hb = jnp.asarray(
        np.random.default_rng(0).normal(size=(nb, 128, f)).astype(np.float32)
    )
    want = np.asarray(_ref(hb, dev, batch))
    got = np.asarray(_got(hb, dev.pool, batch))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_grad_matches_xla():
    dev, batch, nb = _fixture(seed=5)
    hb = jnp.asarray(
        np.random.default_rng(1).normal(size=(nb, 128, 32)).astype(np.float32)
    )

    def loss_ref(hb):
        return (_ref(hb, dev, batch) ** 2).sum()

    def loss_got(hb):
        return (_got(hb, dev.pool, batch) ** 2).sum()

    g_want = np.asarray(jax.grad(loss_ref)(hb))
    g_got = np.asarray(jax.grad(loss_got)(hb))
    np.testing.assert_allclose(g_got, g_want, rtol=1e-5, atol=1e-5)


def test_bf16_pool_matches_xla_bf16():
    import dataclasses

    dev, batch, nb = _fixture(seed=7)
    dev16 = dataclasses.replace(dev, pool=dev.pool.astype(jnp.bfloat16))
    hb = jnp.asarray(
        np.random.default_rng(2).normal(size=(nb, 128, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)
    want = np.asarray(_ref(hb, dev16, batch))
    got = np.asarray(_got(hb, dev16.pool, batch))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
