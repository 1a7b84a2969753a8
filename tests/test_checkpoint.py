"""Checkpoint bundle round-trip (the resume path the reference lacks —
SURVEY §5 checkpoint/resume row)."""

import jax
import numpy as np
import optax

from dgcnn_tpu.models.dgcnn import DGCNN, init_params
from dgcnn_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


def test_roundtrip(tmp_path):
    model = DGCNN(num_features=8, num_classes=2)
    params = init_params(jax.random.PRNGKey(0), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    bundle = {"params": params, "opt_state": opt_state, "epoch": np.int64(17)}

    path = str(tmp_path / "ckpt")
    assert not checkpoint_exists(path)
    save_checkpoint(path, bundle)
    assert checkpoint_exists(path)

    restored = load_checkpoint(path, bundle)
    assert int(restored["epoch"]) == 17
    for a, b in zip(
        jax.tree_util.tree_leaves(bundle["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
