"""Determinism by construction (SURVEY §5 "race detection" row).

The reference needs cuDNN flags and global seeding to approximate
reproducibility (reference set_determ.py:17-26); JAX's jit purity +
explicit PRNG keys give it structurally. These tests pin that down as
BITWISE guarantees, the strongest form of the repeated-step equality
check the survey calls for."""

import jax
import numpy as np
import optax

from dgcnn_tpu.batching import compute_bucket, pack_batch, pack_epoch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.train.loop import make_train_epoch


def _bits(tree):
    return [np.asarray(leaf).tobytes() for leaf in jax.tree_util.tree_leaves(tree)]


def test_forward_bitwise_repeatable():
    gs = synthesize_tu_dataset("PROTEINS", num_graphs=8, seed=1)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    batch = jax.device_put(pack_batch(gs, np.arange(8), compute_bucket(gs, 8)))

    a = apply(params, model, batch)
    b = apply(params, model, batch)
    assert _bits(a) == _bits(b)


def test_train_epoch_bitwise_repeatable():
    """Same params/batches/rng → bit-identical updated params, twice —
    including dropout (explicit key) and the Adam update."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=2)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(3), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batches = jax.device_put(
        pack_epoch(gs, np.arange(20), 10, compute_bucket(gs, 10))
    )
    train_epoch = make_train_epoch(model, optimizer)

    outs = [
        train_epoch(params, opt_state, jax.random.PRNGKey(9), batches)
        for _ in range(2)
    ]
    p1, _, k1, l1, c1 = outs[0]
    p2, _, k2, l2, c2 = outs[1]
    assert _bits(p1) == _bits(p2)
    assert _bits((k1, l1, c1)) == _bits((k2, l2, c2))


def test_init_params_key_determinism():
    model = DGCNN(num_features=8, num_classes=2)
    a = init_params(jax.random.PRNGKey(5), model)
    b = init_params(jax.random.PRNGKey(5), model)
    c = init_params(jax.random.PRNGKey(6), model)
    assert _bits(a) == _bits(b)
    assert _bits(a) != _bits(c)
