"""End-to-end CV driver test: artifact contract (per-fold CSV, overall CSV,
checkpoints — reference train.py:129-131,144-145) and resume."""

import os

import numpy as np

from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.train.cv import run_cross_validation
import pytest


def _cfg(tmp_path, **kw):
    base = dict(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=3,
        seed=324,
        num_folds=3,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
        node_pad_multiple=64,
        edge_pad_multiple=128,
        graph_pad_multiple=4,
    )
    base.update(kw)
    return Config(**base)


def test_cv_artifacts_and_aggregate(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = _cfg(tmp_path)
    result = run_cross_validation(cfg, dataset=gs)

    assert len(result["test_accuracies"]) == 3
    for fold in (1, 2, 3):
        csv = tmp_path / "statistics" / f"MUTAG_results_{fold}.csv"
        assert csv.exists()
        lines = csv.read_text().strip().splitlines()
        assert lines[0] == "epoch,train_loss,test_loss,train_accuracy,test_accuracy"
        assert len(lines) == cfg.num_epochs + 1
        assert os.path.exists(tmp_path / "epochs" / f"MUTAG_{fold}.npz")
    overall = tmp_path / "statistics" / "MUTAG_results_overall.csv"
    assert overall.exists()
    assert len(overall.read_text().strip().splitlines()) == 4
    # aggregate = mean of last-epoch accuracies (reference train.py:135-136)
    np.testing.assert_allclose(
        result["test_accuracy_mean"], np.mean(result["test_accuracies"])
    )
    # events stream exists and records epochs
    events = tmp_path / "statistics" / "MUTAG_events.jsonl"
    assert events.exists()
    assert sum(1 for line in events.open() if '"epoch"' in line) == 9


@pytest.mark.slow
def test_cli_out_root_flag(tmp_path, monkeypatch):
    """--out_root redirects both artifact dirs (so two runs can be
    byte-compared with tools/diff_runs.py without cd tricks)."""
    from dgcnn_tpu.cli import get_args

    opt = get_args(["--data_type", "MUTAG", "--out_root", str(tmp_path / "r")])
    assert opt.out_root == str(tmp_path / "r")
    # mirror cli.main's Config assembly for the out_root fields
    cfg = Config(
        data_type="MUTAG", num_epochs=2, num_folds=2,
        epochs_dir=os.path.join(opt.out_root, "epochs"),
        statistics_dir=os.path.join(opt.out_root, "statistics"),
    )
    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=5)
    run_cross_validation(cfg, dataset=gs)
    assert (tmp_path / "r" / "statistics" / "MUTAG_results_overall.csv").exists()
    assert (tmp_path / "r" / "epochs" / "MUTAG_1.npz").exists()


def test_cli_hyperparameter_flags():
    """--lr/--sortpool_k/--hidden_dims/--dense_dim/--dropout/--num_folds
    plumb to Config (defaults reproduce the reference's hardcoded values,
    reference model.py:13-23, train.py:98-99)."""
    from dgcnn_tpu.cli import get_args

    opt = get_args(["--data_type", "MUTAG"])
    assert (opt.lr, opt.sortpool_k, opt.dense_dim, opt.dropout,
            opt.num_folds) == (1e-3, 30, 128, 0.5, 10)
    assert tuple(int(v) for v in opt.hidden_dims.split(",")) == (32, 32, 32, 1)
    defaults = Config(data_type="MUTAG")
    assert defaults.learning_rate == opt.lr
    assert defaults.sort_pool_k == opt.sortpool_k
    assert defaults.hidden_dims == (32, 32, 32, 1)

    opt = get_args([
        "--data_type", "MUTAG", "--lr", "0.005", "--sortpool_k", "20",
        "--hidden_dims", "16,16,1", "--dense_dim", "64",
        "--dropout", "0.3", "--num_folds", "3",
    ])
    cfg = Config(
        data_type="MUTAG", learning_rate=opt.lr, sort_pool_k=opt.sortpool_k,
        hidden_dims=tuple(int(v) for v in opt.hidden_dims.split(",")),
        dense_dim=opt.dense_dim, dropout_rate=opt.dropout,
        num_folds=opt.num_folds,
    )
    assert cfg.hidden_dims == (16, 16, 1) and cfg.num_folds == 3


@pytest.mark.slow
def test_cv_resume_skips_completed_folds(tmp_path, capsys):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    run_cross_validation(_cfg(tmp_path), dataset=gs)
    capsys.readouterr()
    # delete fold-3 artifacts → resume should redo only fold 3
    os.remove(tmp_path / "statistics" / "MUTAG_results_3.csv")
    result = run_cross_validation(
        _cfg(tmp_path, checkpoint_resume=True), dataset=gs
    )
    out = capsys.readouterr().out
    assert out.count("resumed (complete)") == 2
    assert len(result["test_accuracies"]) == 3


@pytest.mark.slow
def test_cv_reproducible(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    r1 = run_cross_validation(_cfg(tmp_path, statistics_dir=str(tmp_path / "s1"),
                                   epochs_dir=str(tmp_path / "e1")), dataset=gs)
    r2 = run_cross_validation(_cfg(tmp_path, statistics_dir=str(tmp_path / "s2"),
                                   epochs_dir=str(tmp_path / "e2")), dataset=gs)
    np.testing.assert_allclose(r1["test_accuracies"], r2["test_accuracies"])
    np.testing.assert_allclose(r1["train_accuracies"], r2["train_accuracies"])


@pytest.mark.slow
def test_fused_run_epochs_equals_sequential():
    """DenseEngine.run_epochs (one fused multi-epoch dispatch) must produce
    the SAME per-epoch metrics and final params as per-epoch execution —
    same RNG threading, same shuffle consumption."""
    import jax
    import optax

    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.cv import DenseEngine

    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=4)
    cfg = Config(data_type="MUTAG", batch_size=8, graph_pad_multiple=4)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    optimizer = optax.adam(1e-3)
    engine = DenseEngine(cfg, gs, model, optimizer)
    train_idx, test_idx = np.arange(24), np.arange(24, 30)
    engine.begin_fold(train_idx, test_idx)

    perms = np.stack([np.random.default_rng(e).permutation(24) for e in range(4)])
    p0 = init_params(jax.random.PRNGKey(0), model)
    s0 = optimizer.init(p0)
    k0 = jax.random.PRNGKey(7)

    pf, sf, kf, rows_fused = engine.run_epochs(p0, s0, k0, perms)
    # sequential path = EngineBase implementation
    from dgcnn_tpu.train.cv import EngineBase

    ps, ss, ks, rows_seq = EngineBase.run_epochs(engine, p0, s0, k0, perms)

    np.testing.assert_allclose(rows_fused, rows_seq, rtol=1e-6, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(kf), np.asarray(ks))


@pytest.mark.slow
def test_fused_coo_run_epochs_equals_sequential():
    """CooEngine.run_epochs (chunked fused dispatch) must match per-epoch
    execution exactly, including across chunk boundaries."""
    import jax
    import optax

    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.cv import CooEngine, EngineBase

    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=4)
    cfg = Config(
        data_type="MUTAG", batch_size=8,
        node_pad_multiple=64, edge_pad_multiple=128, graph_pad_multiple=4,
    )
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    optimizer = optax.adam(1e-3)
    engine = CooEngine(cfg, gs, model, optimizer)
    engine.begin_fold(np.arange(24), np.arange(24, 30))
    engine._fuse_epochs = 3  # force a chunk boundary inside 5 epochs

    perms = np.stack([np.random.default_rng(e).permutation(24) for e in range(5)])
    p0 = init_params(jax.random.PRNGKey(0), model)
    s0 = optimizer.init(p0)
    k0 = jax.random.PRNGKey(7)

    pf, _, kf, rows_fused = engine.run_epochs(p0, s0, k0, perms)
    ps, _, ks, rows_seq = EngineBase.run_epochs(engine, p0, s0, k0, perms)

    np.testing.assert_allclose(rows_fused, rows_seq, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(kf), np.asarray(ks))


def test_sort_pool_percentile():
    """Original-paper k selection (BASELINE config: 'k=0.6 SortPooling'):
    k = p-quantile of graph sizes, floored at 10."""
    from dgcnn_tpu.train.cv import percentile_sort_pool_k

    counts = np.array([5, 8, 10, 12, 20, 30, 40, 50, 60, 100])
    # 0.6-quantile of 10 sizes → 6th smallest = 30
    assert percentile_sort_pool_k(counts, 0.6) == 30
    # tiny graphs floor at 10
    assert percentile_sort_pool_k(np.array([2, 3, 4]), 0.6) == 10


@pytest.mark.slow
def test_cv_with_percentile_k(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = _cfg(tmp_path, sort_pool_percentile=0.6, num_epochs=2)
    result = run_cross_validation(cfg, dataset=gs)
    assert len(result["test_accuracies"]) == 3
    assert all(np.isfinite(a) for a in result["test_accuracies"])
