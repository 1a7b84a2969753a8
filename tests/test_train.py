"""Training loop tests: the jitted scan-epoch runs, learns, and is
bitwise-deterministic (SURVEY §5 race-detection row: determinism by
construction + repeated-step equality check)."""

import jax
import numpy as np
import optax

from dgcnn_tpu.batching import compute_bucket, pack_epoch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, init_params
from dgcnn_tpu.train.loop import make_eval_epoch, make_train_epoch
import pytest


def _setup(num_graphs=60, seed=0):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=num_graphs, seed=seed)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(42), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    bucket = compute_bucket(gs, 20)
    batches = jax.device_put(pack_epoch(gs, np.arange(num_graphs), 20, bucket))
    return gs, model, params, optimizer, opt_state, batches


def test_train_epoch_runs_and_learns():
    gs, model, params, optimizer, opt_state, batches = _setup()
    train_epoch = make_train_epoch(model, optimizer)
    eval_epoch = make_eval_epoch(model)

    loss0, _ = jax.device_get(eval_epoch(params, batches))
    rng = jax.random.PRNGKey(0)
    for _ in range(30):
        params, opt_state, rng, loss, correct = train_epoch(
            params, opt_state, rng, batches
        )
    loss_end, correct_end = jax.device_get(eval_epoch(params, batches))
    assert np.isfinite(loss_end)
    assert loss_end < loss0, (loss_end, loss0)
    # synthetic data carries planted signal → should beat chance on train set
    assert correct_end / gs.num_graphs > 0.6


def test_training_deterministic():
    """Same seeds → bitwise-identical params after several epochs."""
    _, model, params, optimizer, opt_state, batches = _setup()

    def run():
        p, s, rng = params, opt_state, jax.random.PRNGKey(7)
        train_epoch = make_train_epoch(model, optimizer)
        for _ in range(3):
            p, s, rng, loss, _ = train_epoch(p, s, rng, batches)
        return jax.device_get((p, loss))

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_eval_loss_matches_manual():
    """Epoch metric = mean of per-batch means (reference train.py:47,66 —
    an uneven final batch is over-weighted exactly as in the reference)."""
    gs, model, params, optimizer, opt_state, _ = _setup(num_graphs=25)
    from dgcnn_tpu.batching import pack_batch
    from dgcnn_tpu.models.dgcnn import apply
    from dgcnn_tpu.train.loop import nll_loss_and_correct

    bucket = compute_bucket(gs, 10)
    batches = jax.device_put(pack_epoch(gs, np.arange(25), 10, bucket))
    eval_epoch = make_eval_epoch(model)
    got_loss, got_correct = jax.device_get(eval_epoch(params, batches))

    losses, corrects = [], 0.0
    for i in range(0, 25, 10):
        b = jax.device_put(pack_batch(gs, np.arange(25)[i : i + 10], bucket))
        lp = apply(params, model, b)
        loss, corr = nll_loss_and_correct(lp, b.y, b.graph_mask)
        losses.append(float(loss))
        corrects += float(corr)
    np.testing.assert_allclose(got_loss, np.mean(losses), rtol=1e-5)
    np.testing.assert_allclose(got_correct, corrects, rtol=1e-6)


def test_flat_adam_matches_per_leaf_adam():
    """flatten_optimizer (train/flat_opt.py): Adam on the raveled vector
    computes BITWISE the same parameter trajectory as per-leaf Adam —
    elementwise math is invariant to the ravel."""
    import optax

    from dgcnn_tpu.train.flat_opt import flatten_optimizer

    key = jax.random.PRNGKey(4)
    params = {
        "a": jax.random.normal(jax.random.fold_in(key, 0), (7, 5)),
        "b": [jax.random.normal(jax.random.fold_in(key, 1), (3,)),
              jax.random.normal(jax.random.fold_in(key, 2), (2, 2, 2))],
    }
    opt = optax.adam(1e-3)
    flat = flatten_optimizer(opt)
    s1, s2 = opt.init(params), flat.init(params)
    p1 = p2 = params
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(key, 10 + i), p.shape),
            p1,
        )
        u1, s1 = opt.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = flat.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.slow
def test_cv_runs_with_opt_flatten(tmp_path):
    """End-to-end CV smoke with the flattened optimizer, sequential and
    fold-lockstep drivers."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=9)
    for cv_parallel in ("sequential", "folds"):
        cfg = Config(
            data_type="MUTAG",
            num_epochs=2,
            batch_size=8,
            num_folds=2,
            layout="dense",
            opt_flatten=True,
            cv_parallel=cv_parallel,
            epochs_dir=str(tmp_path / cv_parallel / "epochs"),
            statistics_dir=str(tmp_path / cv_parallel / "statistics"),
        )
        result = run_cross_validation(cfg, dataset=gs)
        accs = result["test_accuracies"]
        assert len(accs) == 2 and all(0.0 <= a <= 100.0 for a in accs)
