"""Fold-lockstep CV (train/cv_vmap.py): per-fold metric equality with the
sequential driver, ragged-fold masking, and artifact contract."""

import os

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.train.cv import run_cross_validation


def _cfg(tmp_path, sub, **kw):
    base = dict(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=4,
        seed=324,
        num_folds=3,
        layout="dense",
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / sub / "epochs"),
        statistics_dir=str(tmp_path / sub / "statistics"),
        graph_pad_multiple=4,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_lockstep_matches_sequential(tmp_path):
    """Same dataset/seed → the lockstep driver reproduces the sequential
    driver's per-fold per-epoch CSVs (identical RNG streams; float
    tolerance for batched-op reassociation)."""
    # 37 graphs → ragged: stratified folds give unequal train sizes and a
    # ragged last batch, exercising the masked lockstep path
    gs = synthesize_tu_dataset("MUTAG", num_graphs=37, seed=5)
    r_seq = run_cross_validation(
        _cfg(tmp_path, "seq", cv_parallel="sequential"), dataset=gs
    )
    r_vec = run_cross_validation(
        _cfg(tmp_path, "vec", cv_parallel="folds"), dataset=gs
    )

    np.testing.assert_allclose(
        r_vec["test_accuracies"], r_seq["test_accuracies"]
    )
    np.testing.assert_allclose(
        r_vec["train_accuracies"], r_seq["train_accuracies"]
    )
    for fold in (1, 2, 3):
        a = (tmp_path / "seq" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        b = (tmp_path / "vec" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        la, lb = a.splitlines(), b.splitlines()
        assert la[0] == lb[0]
        for ra, rb in zip(la[1:], lb[1:]):
            va = np.array([float(x) for x in ra.split(",")])
            vb = np.array([float(x) for x in rb.split(",")])
            np.testing.assert_allclose(vb, va, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_lockstep_artifacts(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = _cfg(tmp_path, "v", cv_parallel="folds")
    result = run_cross_validation(cfg, dataset=gs)
    assert len(result["test_accuracies"]) == 3
    for fold in (1, 2, 3):
        assert os.path.exists(tmp_path / "v" / "epochs" / f"MUTAG_{fold}.npz")
        csv = tmp_path / "v" / "statistics" / f"MUTAG_results_{fold}.csv"
        assert len(csv.read_text().strip().splitlines()) == cfg.num_epochs + 1
    overall = tmp_path / "v" / "statistics" / "MUTAG_results_overall.csv"
    assert overall.exists()


def test_auto_picks_lockstep_only_when_safe(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    # resume requested → sequential driver (per-fold resume capability)
    run_cross_validation(
        _cfg(tmp_path, "r", checkpoint_resume=True), dataset=gs
    )
    # second run resumes per fold — only possible on the sequential path
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_cross_validation(
            _cfg(tmp_path, "r", checkpoint_resume=True), dataset=gs
        )
    assert buf.getvalue().count("resumed (complete)") == 3


@pytest.mark.slow
def test_lockstep_ragged_step_counts_match_sequential(tmp_path):
    """Folds with FEWER train steps than the lockstep maximum must not
    consume PRNG splits on their padded steps — their dropout streams
    must match the sequential driver exactly. 73 graphs / 3 folds / batch
    16 → train sizes 48/49/49 → 3 vs 4 steps."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=73, seed=9)
    kw = dict(num_epochs=3)
    r_seq = run_cross_validation(
        _cfg(tmp_path, "rs", cv_parallel="sequential", **kw), dataset=gs
    )
    r_vec = run_cross_validation(
        _cfg(tmp_path, "rv", cv_parallel="folds", **kw), dataset=gs
    )
    np.testing.assert_allclose(r_vec["test_accuracies"], r_seq["test_accuracies"])
    for fold in (1, 2, 3):
        a = (tmp_path / "rs" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        b = (tmp_path / "rv" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        for ra, rb in zip(a.splitlines()[1:], b.splitlines()[1:]):
            va = np.array([float(x) for x in ra.split(",")])
            vb = np.array([float(x) for x in rb.split(",")])
            np.testing.assert_allclose(vb, va, rtol=5e-4, atol=5e-4,
                                       err_msg=f"fold {fold}")


def test_lockstep_explicit_request_validates(tmp_path):
    """cv_parallel='folds' fails loudly on an incompatible layout/mesh;
    checkpoint resume is NOT in the incompatible set anymore (lockstep
    resumes via one stacked inflight bundle — covered end-to-end by
    tests/test_resume.py::test_lockstep_resume_reproduces_uninterrupted_run)."""
    import pytest

    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    with pytest.raises(ValueError, match="layout"):
        run_cross_validation(
            _cfg(tmp_path, "y", cv_parallel="folds", layout="coo"), dataset=gs
        )
    # a (D, 1) mesh with D ∤ num_folds is now VALID (padded masked
    # folds); only a non-(D, 1) mesh stays incompatible
    with pytest.raises(ValueError, match="mesh"):
        run_cross_validation(
            _cfg(tmp_path, "z", cv_parallel="folds", mesh_shape=(2, 2)),
            dataset=gs,
        )


@pytest.mark.slow
def test_block_lockstep_matches_sequential(tmp_path):
    """Fold-lockstep on the BLOCK layout (VERDICT r3 #1): same per-fold
    results as the sequential BlockSparseEngine — the fold-batched
    propagation reassociates only across folds, which are independent."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=37, seed=5)
    r_seq = run_cross_validation(
        _cfg(tmp_path, "bs", cv_parallel="sequential", layout="block"),
        dataset=gs,
    )
    r_vec = run_cross_validation(
        _cfg(tmp_path, "bv", cv_parallel="folds", layout="block"), dataset=gs
    )
    np.testing.assert_allclose(
        r_vec["test_accuracies"], r_seq["test_accuracies"]
    )
    np.testing.assert_allclose(
        r_vec["train_accuracies"], r_seq["train_accuracies"]
    )
    for fold in (1, 2, 3):
        a = (tmp_path / "bs" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        b = (tmp_path / "bv" / "statistics" / f"MUTAG_results_{fold}.csv").read_text()
        for ra, rb in zip(a.splitlines()[1:], b.splitlines()[1:]):
            va = np.array([float(x) for x in ra.split(",")])
            vb = np.array([float(x) for x in rb.split(",")])
            np.testing.assert_allclose(vb, va, rtol=5e-4, atol=5e-4,
                                       err_msg=f"fold {fold}")


def test_fold_sharded_lockstep_matches_single_device(tmp_path):
    """The pod recipe (SCALING.md, VERDICT r3 #2): folds sharded over the
    mesh "data" axis produce the SAME per-fold metrics as the one-device
    lockstep run — the fold axis is embarrassingly parallel, so sharding
    it is a pure partitioning with no collectives and no reassociation."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=7)
    kw = dict(num_folds=2, num_epochs=2)
    r1 = run_cross_validation(
        _cfg(tmp_path, "f1", cv_parallel="folds", **kw), dataset=gs
    )
    r2 = run_cross_validation(
        _cfg(tmp_path, "f2", cv_parallel="folds", mesh_shape=(2, 1), **kw),
        dataset=gs,
    )
    np.testing.assert_allclose(r2["test_accuracies"], r1["test_accuracies"])
    np.testing.assert_allclose(r2["train_accuracies"], r1["train_accuracies"])


def test_fold_sharded_lockstep_pads_nondivisible_folds(tmp_path):
    """D ∤ K fold sharding (VERDICT r4 #2): 3 folds on a (2, 1) mesh pad
    the fold axis to 4 with a fully masked fold — per-fold metrics must
    equal the one-device lockstep run's, and only the 3 real folds may
    produce artifacts."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=7)
    kw = dict(num_folds=3, num_epochs=2)
    r1 = run_cross_validation(
        _cfg(tmp_path, "p1", cv_parallel="folds", **kw), dataset=gs
    )
    r2 = run_cross_validation(
        _cfg(tmp_path, "p2", cv_parallel="folds", mesh_shape=(2, 1), **kw),
        dataset=gs,
    )
    np.testing.assert_allclose(r2["test_accuracies"], r1["test_accuracies"])
    np.testing.assert_allclose(r2["train_accuracies"], r1["train_accuracies"])
    assert len(r2["test_accuracies"]) == 3
    stats = tmp_path / "p2" / "statistics"
    assert (stats / "MUTAG_results_3.csv").exists()
    assert not (stats / "MUTAG_results_4.csv").exists()
    assert not (tmp_path / "p2" / "epochs" / "MUTAG_4.npz").exists()


@pytest.mark.parametrize("layout", ["block", "multi"])
def test_fold_sharded_block_lockstep_pads_nondivisible_folds(tmp_path, layout):
    """Same D ∤ K padding on the BLOCK and MULTI layouts (their runners
    wrap the body in shard_map with per-device merged streams — the
    padded fold contributes zero items on its device group)."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=7)
    kw = dict(num_folds=3, num_epochs=2, layout=layout)
    r1 = run_cross_validation(
        _cfg(tmp_path, "q1", cv_parallel="folds", **kw), dataset=gs
    )
    r2 = run_cross_validation(
        _cfg(tmp_path, "q2", cv_parallel="folds", mesh_shape=(2, 1), **kw),
        dataset=gs,
    )
    np.testing.assert_allclose(r2["test_accuracies"], r1["test_accuracies"])
    np.testing.assert_allclose(r2["train_accuracies"], r1["train_accuracies"])


def test_fold_shard_devices_predicate():
    from dgcnn_tpu.train.cv_vmap import fold_shard_devices

    assert fold_shard_devices((1, 1), 10) == 1
    assert fold_shard_devices((2, 1), 10) == 2
    assert fold_shard_devices((5, 1), 10) == 5
    assert fold_shard_devices((10, 1), 10) == 10
    # D ∤ K: still shardable — the runner pads the fold axis with masked
    # folds (VERDICT r4 #2: 10 folds must shard on 4- and 8-chip hosts)
    assert fold_shard_devices((4, 1), 10) == 4
    assert fold_shard_devices((8, 1), 10) == 8
    assert fold_shard_devices((2, 2), 10) is None   # graph axis must be 1
    assert fold_shard_devices((8, 1), 8) == 8
