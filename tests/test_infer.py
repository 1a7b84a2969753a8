"""Inference surface: checkpoint round-trip and batch prediction."""

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.infer import load_fold_params, main, predict_dataset
from dgcnn_tpu.models.dgcnn import DGCNN
from dgcnn_tpu.train.cv import run_cross_validation
import pytest


@pytest.mark.slow
def test_predict_from_fold_checkpoint(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = Config(
        data_type="MUTAG", batch_size=16, num_epochs=15, num_folds=2,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
        node_pad_multiple=64, edge_pad_multiple=128, graph_pad_multiple=4,
    )
    run_cross_validation(cfg, dataset=gs)

    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    accs = []
    for fold in (1, 2):
        params = load_fold_params(str(tmp_path / "epochs" / f"MUTAG_{fold}"), model)
        log_probs, labels = predict_dataset(params, model, gs, batch_size=16)
        assert log_probs.shape == (40, 2)
        assert labels.shape == (40,)
        # log-probs normalize
        np.testing.assert_allclose(np.exp(log_probs).sum(-1), 1.0, rtol=1e-4)
        accs.append((labels == gs.y).mean())
    # the planted synthetic signal is easy: a trained fold classifies most
    # of the dataset correctly (individual folds can straggle at a bad
    # init, hence best-of-folds)
    assert max(accs) > 0.7, accs


@pytest.mark.slow
def test_infer_cli(tmp_path, capsys):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = Config(
        data_type="MUTAG", batch_size=16, num_epochs=3, num_folds=2,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
        node_pad_multiple=64, edge_pad_multiple=128, graph_pad_multiple=4,
    )
    run_cross_validation(cfg, dataset=gs)
    out_csv = tmp_path / "preds.csv"
    # the CLI loads the dataset itself — synthetic MUTAG regenerates the
    # same graphs from the default seed
    main([
        "--data_type", "MUTAG",
        "--checkpoint", str(tmp_path / "epochs" / "MUTAG_1"),
        "--data_root", str(tmp_path / "infer_data"),
        "--batch_size", "16",
        "--out", str(out_csv),
        "--synthetic",
    ])
    assert "accuracy vs dataset labels" in capsys.readouterr().out
    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "graph,predicted_label,confidence,true_label"
    assert len(lines) == 188 + 1  # full synthetic MUTAG profile


def test_load_fold_params_from_opt_flatten_checkpoint(tmp_path):
    """Checkpoints written by --opt_flatten runs carry a raveled-vector
    Adam state; the inference loader must still reach their params."""
    import jax
    import optax

    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.infer import load_fold_params
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.flat_opt import flatten_optimizer
    from dgcnn_tpu.utils.checkpoint import save_checkpoint

    gs = synthesize_tu_dataset("MUTAG", num_graphs=12, seed=0)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(3), model)
    opt = flatten_optimizer(optax.adam(1e-3))
    path = str(tmp_path / "MUTAG_1")
    save_checkpoint(path, {"params": params, "opt_state": opt.init(params)})

    loaded = load_fold_params(path, model)
    got = jax.tree_util.tree_leaves(loaded)
    want = jax.tree_util.tree_leaves(params)
    assert all(np.array_equal(a, b) for a, b in zip(got, want))
