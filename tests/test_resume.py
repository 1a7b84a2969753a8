"""Mid-fold (epoch-level) checkpoint resume: a crashed fold continues at
the exact epoch boundary and reproduces the uninterrupted run bitwise
(same shuffle stream, params, optimizer state, RNG)."""

import numpy as np
import pytest

import dgcnn_tpu.train.cv as cv_mod
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.train.cv import run_cross_validation


def _cfg(tmp_path, tag, **kw):
    base = dict(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=6,
        num_folds=2,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / f"epochs_{tag}"),
        statistics_dir=str(tmp_path / f"stats_{tag}"),
        node_pad_multiple=64,
        edge_pad_multiple=128,
        graph_pad_multiple=4,
    )
    base.update(kw)
    return Config(**base)


class _Crash(RuntimeError):
    pass


@pytest.mark.slow
def test_midfold_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch, capsys):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)

    # reference: uninterrupted 6-epoch fold — pinned to the sequential
    # driver (the resume path is sequential; lockstep execution is
    # allclose- but not bitwise-identical across the driver boundary)
    run_cross_validation(
        _cfg(tmp_path, "full", cv_parallel="sequential"), dataset=gs
    )
    want = (tmp_path / "stats_full" / "MUTAG_results_1.csv").read_text()

    # crash the run at epoch 4 (after epoch 3's inflight bundle is written):
    # EventLog.write fires before the checkpoint save, so blow up on the
    # epoch-4 event.
    orig_write = cv_mod.EventLog.write

    def exploding_write(self, **event):
        if (
            event.get("kind") == "epoch"
            and event.get("epoch") == 4
            and event.get("fold") == 1
        ):
            raise _Crash()
        return orig_write(self, **event)

    monkeypatch.setattr(cv_mod.EventLog, "write", exploding_write)
    with pytest.raises(_Crash):
        run_cross_validation(
            _cfg(tmp_path, "crash", checkpoint_every=1,
                 cv_parallel="sequential"),
            dataset=gs,
        )
    monkeypatch.setattr(cv_mod.EventLog, "write", orig_write)
    assert (tmp_path / "epochs_crash" / "MUTAG_1_inflight.npz").exists()

    # resume: continues at epoch 4 and the final CSV matches the
    # uninterrupted run byte-for-byte
    capsys.readouterr()
    run_cross_validation(
        _cfg(tmp_path, "crash", checkpoint_every=1, checkpoint_resume=True,
             cv_parallel="sequential"),
        dataset=gs,
    )
    out = capsys.readouterr().out
    assert "resumed at epoch 4" in out
    got = (tmp_path / "stats_crash" / "MUTAG_results_1.csv").read_text()
    assert got == want
    # inflight bundle cleaned up after fold completion
    assert not (tmp_path / "epochs_crash" / "MUTAG_1_inflight.npz").exists()


@pytest.mark.slow
def test_lockstep_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch, capsys):
    """The fold-lockstep driver (the auto default for small dense datasets)
    checkpoints ONE stacked bundle and resumes every fold together at the
    chunk boundary, bitwise vs its own uninterrupted run."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)

    # uninterrupted lockstep reference at the same chunking
    run_cross_validation(
        _cfg(tmp_path, "lsfull", checkpoint_every=1), dataset=gs
    )
    want = [
        (tmp_path / "stats_lsfull" / f"MUTAG_results_{f}.csv").read_text()
        for f in (1, 2)
    ]

    # crash at epoch 4's event (epoch-3 stacked bundle already on disk)
    orig_write = cv_mod.EventLog.write

    def exploding_write(self, **event):
        if event.get("kind") == "epoch" and event.get("epoch") == 4:
            raise _Crash()
        return orig_write(self, **event)

    monkeypatch.setattr(cv_mod.EventLog, "write", exploding_write)
    with pytest.raises(_Crash):
        run_cross_validation(
            _cfg(tmp_path, "lscrash", checkpoint_every=1), dataset=gs
        )
    monkeypatch.setattr(cv_mod.EventLog, "write", orig_write)
    assert (tmp_path / "epochs_lscrash" / "MUTAG_lockstep_inflight.npz").exists()

    capsys.readouterr()
    run_cross_validation(
        _cfg(tmp_path, "lscrash", checkpoint_every=1, checkpoint_resume=True),
        dataset=gs,
    )
    out = capsys.readouterr().out
    assert "resumed at epoch 4 (lockstep)" in out
    for f in (1, 2):
        got = (tmp_path / "stats_lscrash" / f"MUTAG_results_{f}.csv").read_text()
        assert got == want[f - 1]
    assert not (
        tmp_path / "epochs_lscrash" / "MUTAG_lockstep_inflight.npz"
    ).exists()

    # a completed lockstep run resumes as complete without retraining
    capsys.readouterr()
    run_cross_validation(
        _cfg(tmp_path, "lscrash", checkpoint_every=1, checkpoint_resume=True),
        dataset=gs,
    )
    out = capsys.readouterr().out
    assert out.count("resumed (complete)") == 2


def test_resume_beyond_requested_epochs_refuses(tmp_path, monkeypatch):
    """An inflight checkpoint past --num_epochs must error, not silently
    publish a longer-protocol fold as the shorter protocol's result."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=0)

    # crash on the epoch-3 event: epoch 2's inflight bundle already exists
    orig_write = cv_mod.EventLog.write

    def exploding_write(self, **event):
        if event.get("kind") == "epoch" and event.get("epoch") == 3:
            raise _Crash()
        return orig_write(self, **event)

    monkeypatch.setattr(cv_mod.EventLog, "write", exploding_write)
    with pytest.raises(_Crash):
        run_cross_validation(
            _cfg(tmp_path, "mid", num_epochs=4, checkpoint_every=2,
                 cv_parallel="sequential"),
            dataset=gs,
        )
    monkeypatch.setattr(cv_mod.EventLog, "write", orig_write)
    assert (tmp_path / "epochs_mid" / "MUTAG_1_inflight.npz").exists()

    # resume asking for FEWER epochs than the checkpoint already holds
    with pytest.raises(ValueError, match="beyond --num_epochs"):
        run_cross_validation(
            _cfg(tmp_path, "mid", num_epochs=1, checkpoint_every=2,
                 cv_parallel="sequential", checkpoint_resume=True),
            dataset=gs,
        )
