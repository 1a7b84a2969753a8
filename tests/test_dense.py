"""Dense block-diagonal layout: exact semantic equality with the COO path,
plus dense-specific edge cases and trainability."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.dense import (
    dense_epoch_bytes,
    dense_tile,
    pack_dense_batch,
    pack_dense_epoch,
)
from dgcnn_tpu.data.synthetic import PROFILES, synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.ops.sort_pool import sort_pool_dense
from dgcnn_tpu.train.loop import make_eval_epoch, make_train_epoch


@pytest.mark.parametrize("name", ["MUTAG", "PROTEINS", "IMDB-MULTI"])
def test_dense_equals_coo_logits(name):
    gs = synthesize_tu_dataset(name, num_graphs=14, seed=17)
    idx = np.arange(12)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)

    coo = apply(params, model, jax.device_put(pack_batch(gs, idx, compute_bucket(gs, 12))))
    n_tile = dense_tile(gs)
    dense = apply(
        params, model, jax.device_put(pack_dense_batch(gs, idx, n_tile, 16))
    )
    np.testing.assert_allclose(
        np.asarray(dense)[:12], np.asarray(coo)[:12], rtol=2e-5, atol=1e-6
    )


def test_dense_adjacency_normalization():
    """adj rows must be the symmetric-normalized Â of the oracle."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=3, seed=2)
    b = pack_dense_batch(gs, [0], dense_tile(gs), 4)
    n = gs.num_nodes(0)
    a = b.adj[0, :n, :n]
    # reconstruct unnormalized Â from the graph
    es, ee = gs.edge_ptr[0], gs.edge_ptr[1]
    raw = np.zeros((n, n))
    for s, d in zip(gs.edge_src[es:ee], gs.edge_dst[es:ee]):
        if s != d:
            raw[d, s] += 1
    raw += np.eye(n)
    deg = raw.sum(1)
    want = raw / np.sqrt(deg[:, None] * deg[None, :])
    np.testing.assert_allclose(a, want, rtol=1e-6)
    # padding rows/cols all zero
    assert (b.adj[0, n:, :] == 0).all() and (b.adj[0, :, n:] == 0).all()


def test_sort_pool_dense_edge_cases():
    # graph 0: 2 real nodes of 5 slots, k=4 → zero pad; ties keep node order
    x = np.zeros((2, 5, 3), np.float32)
    x[0, 0] = [10, 0, 1.0]
    x[0, 1] = [20, 0, 1.0]  # tie on key (last channel) with node 0
    x[1, :4] = [[1, 0, 0.1], [2, 0, 0.4], [3, 0, 0.2], [4, 0, 0.3]]
    mask = np.zeros((2, 5), np.float32)
    mask[0, :2] = 1
    mask[1, :4] = 1
    out = np.asarray(sort_pool_dense(jnp.array(x), jnp.array(mask), 4))
    np.testing.assert_allclose(out[0, 0], [10, 0, 1.0])  # tie → lower index first
    np.testing.assert_allclose(out[0, 1], [20, 0, 1.0])
    assert (out[0, 2:] == 0).all()
    np.testing.assert_allclose(out[1, :, 2], [0.4, 0.3, 0.2, 0.1])


def test_dense_train_epoch_learns():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=60, seed=0)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(42), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batches = jax.device_put(
        pack_dense_epoch(gs, np.arange(60), 20, dense_tile(gs), 24)
    )
    train_epoch = make_train_epoch(model, optimizer)
    eval_epoch = make_eval_epoch(model)

    loss0, _ = jax.device_get(eval_epoch(params, batches))
    rng = jax.random.PRNGKey(0)
    for _ in range(25):
        params, opt_state, rng, loss, _ = train_epoch(params, opt_state, rng, batches)
    loss1, correct1 = jax.device_get(eval_epoch(params, batches))
    assert loss1 < loss0
    assert correct1 / 60 > 0.6


def test_dense_epoch_bytes_estimate():
    gs = synthesize_tu_dataset("NCI1", num_graphs=200, seed=0)
    n_tile = dense_tile(gs)
    est = dense_epoch_bytes(gs, 50, n_tile, 56)
    assert est == 4 * 56 * n_tile * (n_tile + gs.num_features + 1) * 4
