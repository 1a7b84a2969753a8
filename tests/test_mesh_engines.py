"""Mesh-engine CV runs on the virtual 8-device CPU mesh: the full driver
(run_cross_validation) under DP×EP meshes for both layouts, and protocol
equivalence of the dense DP engine vs single-device."""

import jax
import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.train.cv import run_cross_validation


def _cfg(tmp_path, **kw):
    base = dict(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=2,
        num_folds=2,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
        node_pad_multiple=64,
        edge_pad_multiple=128,
        graph_pad_multiple=4,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize(
    "mesh,layout",
    [((4, 1), "dense"), ((2, 2), "coo"), ((4, 2), "coo"), ((8, 1), "dense")],
)
def test_cv_runs_on_mesh(tmp_path, mesh, layout):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=48, seed=5)
    result = run_cross_validation(
        _cfg(tmp_path, mesh_shape=mesh, layout=layout), dataset=gs
    )
    assert len(result["test_accuracies"]) == 2
    assert all(np.isfinite(a) for a in result["test_accuracies"])


def test_dense_dp_eval_matches_single_device():
    """Deterministic (eval) loss under the dense DP engine equals the
    single-device dense path on the same graphs — exact global-batch
    semantics (dropout RNG placement differs between engines, so only the
    deterministic path is bitwise-comparable)."""
    import optax

    from dgcnn_tpu.batching.dense import (
        build_dense_dataset,
        dense_tile,
        order_matrix,
        order_matrix_dp,
    )
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.parallel.train_dp import make_dense_dp_epochs
    from dgcnn_tpu.train.loop import make_dense_gather_epochs

    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=3)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    optimizer = optax.adam(1e-3)
    data = jax.device_put(build_dense_dataset(gs, dense_tile(gs)))
    idx = np.arange(40)

    _, eval_single = make_dense_gather_epochs(model, optimizer)
    want_loss, want_correct = jax.device_get(
        eval_single(params, data, order_matrix(idx, 16, 16))
    )

    mesh = make_mesh((4, 2))
    _, eval_dp = make_dense_dp_epochs(model, optimizer, mesh)
    got_loss, got_correct = jax.device_get(
        eval_dp(params, data, order_matrix_dp(idx, 16, 4, 4))
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)
    assert got_correct == want_correct
