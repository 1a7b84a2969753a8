"""Distributed tests on the virtual 8-device CPU mesh (SURVEY §4 item 5).

The key property: partition invariance — 1-chip results == N-way
data-parallel == M-way edge-partitioned results (allclose), for loss,
logits-derived metrics, and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgcnn_tpu.batching import compute_bucket, pack_batch, pack_epoch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.parallel import (
    device_put_epoch,
    lpt_assign,
    make_dp_eval_epoch,
    make_dp_train_epoch,
    make_mesh,
    make_sharded_loss,
    pack_epoch_dp,
    shard_batch_for_dp,
    shard_bucket,
)
from dgcnn_tpu.train.loop import make_eval_epoch, make_train_epoch, nll_loss_and_correct


def _setup(name="MUTAG", n=48, seed=0):
    gs = synthesize_tu_dataset(name, num_graphs=n, seed=seed)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(5), model)
    return gs, model, params


def test_lpt_assign_balanced_and_capped():
    counts = np.array([30, 1, 2, 28, 3, 29, 4, 27])
    groups = lpt_assign(counts, 4, cap=2)
    assert sorted(np.concatenate(groups).tolist()) == list(range(8))
    for g in groups:
        assert len(g) == 2
    totals = [counts[g].sum() for g in groups]
    assert max(totals) - min(totals) <= 4  # big items spread out


def test_sharded_loss_matches_single_device():
    """DP(4) and DP(2)×EP(2) losses equal the single-device global-batch
    loss on the same graphs."""
    gs, model, params = _setup()
    idx = np.arange(20)

    # single device reference
    bucket1 = compute_bucket(gs, 20)
    b1 = jax.device_put(pack_batch(gs, idx, bucket1))
    lp = apply(params, model, b1)
    want_loss, want_correct = nll_loss_and_correct(lp, b1.y, b1.graph_mask)

    for mesh_shape in [(4, 1), (2, 2), (1, 4), (8, 1), (2, 4)]:
        mesh = make_mesh(mesh_shape)
        n_data, n_graph = mesh_shape
        bucket = shard_bucket(gs, 20, n_data, n_graph=n_graph)
        sb = shard_batch_for_dp(gs, idx, bucket, n_data, n_graph)
        loss_fn = make_sharded_loss(model, mesh, deterministic=True)
        got_loss, got_correct = jax.jit(loss_fn)(
            params, jax.tree_util.tree_map(jnp.asarray, sb), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(
            float(got_loss), float(want_loss), rtol=1e-5,
            err_msg=f"mesh {mesh_shape}",
        )
        assert float(got_correct) == float(want_correct), mesh_shape


@pytest.mark.slow
def test_sharded_grads_match_single_device():
    gs, model, params = _setup(n=24)
    idx = np.arange(24)

    bucket1 = compute_bucket(gs, 24)
    b1 = jax.device_put(pack_batch(gs, idx, bucket1))

    def single_loss(p):
        lp = apply(p, model, b1)
        loss, _ = nll_loss_and_correct(lp, b1.y, b1.graph_mask)
        return loss

    want = jax.grad(single_loss)(params)

    mesh = make_mesh((2, 2))
    bucket = shard_bucket(gs, 24, 2, n_graph=2)
    sb = jax.tree_util.tree_map(
        jnp.asarray, shard_batch_for_dp(gs, idx, bucket, 2, 2)
    )
    loss_fn = make_sharded_loss(model, mesh, deterministic=True)
    got = jax.jit(
        jax.grad(lambda p: loss_fn(p, sb, jax.random.PRNGKey(0))[0])
    )(params)

    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2), (4, 2)])
@pytest.mark.slow
def test_dp_train_epoch_runs_and_learns(mesh_shape):
    gs, model, params = _setup(n=64, seed=3)
    mesh = make_mesh(mesh_shape)
    n_data, n_graph = mesh_shape
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    bucket = shard_bucket(gs, 16, n_data, n_graph=n_graph)
    batches = device_put_epoch(
        pack_epoch_dp(gs, np.arange(64), 16, bucket, n_data, n_graph), mesh
    )
    train_epoch = make_dp_train_epoch(model, optimizer, mesh)
    eval_epoch = make_dp_eval_epoch(model, mesh)

    loss0, _ = jax.device_get(eval_epoch(params, batches))
    rng = jax.random.PRNGKey(0)
    for _ in range(15):
        params, opt_state, rng, loss, correct = train_epoch(
            params, opt_state, rng, batches
        )
    loss1, correct1 = jax.device_get(eval_epoch(params, batches))
    assert np.isfinite(loss1)
    assert loss1 < loss0
    assert correct1 / 64 > 0.55


@pytest.mark.slow
def test_dp_matches_single_device_training():
    """Full deterministic-epoch equivalence: a few eval-mode training steps
    via the DP path equal the single-device path on the same batches
    (dropout off to remove RNG-placement differences)."""
    gs, model, params = _setup(n=32, seed=4)
    optimizer = optax.adam(1e-3)

    # single device: batch of 16, 2 steps
    bucket1 = compute_bucket(gs, 16)
    order = np.arange(32)

    def single_run():
        p, s = params, optimizer.init(params)
        for i in (0, 16):
            b = jax.device_put(pack_batch(gs, order[i : i + 16], bucket1))

            def loss_fn(q):
                lp = apply(q, model, b)
                return nll_loss_and_correct(lp, b.y, b.graph_mask)[0]

            g = jax.grad(loss_fn)(p)
            up, s = optimizer.update(g, s, p)
            p = optax.apply_updates(p, up)
        return p

    mesh = make_mesh((4, 1))
    bucket = shard_bucket(gs, 16, 4)
    batches = device_put_epoch(pack_epoch_dp(gs, order, 16, bucket, 4, 1), mesh)
    loss_fn = make_sharded_loss(model, mesh, deterministic=True)

    @jax.jit
    def dp_run(p, s, bs):
        def step(carry, batch):
            p, s = carry
            g = jax.grad(lambda q: loss_fn(q, batch, jax.random.PRNGKey(0))[0])(p)
            up, s = optimizer.update(g, s, p)
            return (optax.apply_updates(p, up), s), None

        (p, s), _ = jax.lax.scan(step, (p, s), bs)
        return p

    p_single = single_run()
    p_dp = dp_run(params, optimizer.init(params), batches)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_dp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-6)
