"""Smoke tests for the ops tooling: release report rendering and the
mesh scaling benchmark driver."""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest


def test_release_report_renders(tmp_path):
    from tools import release_report

    stats = tmp_path / "statistics"
    stats.mkdir()
    with open(tmp_path / "summary.jsonl", "w") as f:
        f.write(json.dumps({"dataset": "MUTAG", "wall_s": 12.5,
                            "test_acc_mean": 90.0, "test_acc_std": 2.0,
                            "train_acc_mean": 95.0}) + "\n")
    with open(stats / "MUTAG_events.jsonl", "w") as f:
        for e in range(4):
            f.write(json.dumps({"kind": "epoch", "fold": 1, "epoch": e + 1,
                                "epoch_seconds": 0.004,
                                "folds_in_lockstep": 10}) + "\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        release_report.main(str(tmp_path))
    out = buf.getvalue()
    assert "| MUTAG |" in out
    # 4 ms lockstep row over 10 folds → 0.4 ms per fold-epoch
    assert "0.4 ms" in out
    # datasets without runs render with their reference numbers
    assert "| DD | — |" in out


def test_tensorboard_export(tmp_path):
    """The JSONL→TensorBoard converter writes per-fold event files with the
    visdom-equivalent scalar series (SURVEY §5)."""
    import pytest

    pytest.importorskip("tensorboardX")
    from dgcnn_tpu.train.tensorboard import export_events

    ev = tmp_path / "MUTAG_events.jsonl"
    with open(ev, "w") as f:
        f.write(json.dumps({"kind": "run_start"}) + "\n")
        for fold in (1, 2):
            for e in (1, 2, 3):
                f.write(json.dumps({
                    "kind": "epoch", "fold": fold, "epoch": e, "ts": 1e9,
                    "train_loss": 0.5, "test_loss": 0.6,
                    "train_accuracy": 90.0, "test_accuracy": 85.0,
                    "edges_per_second": 1e8, "epoch_seconds": 0.01,
                }) + "\n")
    n = export_events(str(ev), str(tmp_path / "runs"))
    assert n == 2 * 3 * 6
    for fold in (1, 2):
        d = tmp_path / "runs" / "MUTAG" / f"fold_{fold}"
        files = list(d.glob("events.out.tfevents.*"))
        assert files and files[0].stat().st_size > 0


def test_diff_runs(tmp_path):
    from tools import diff_runs

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    for d in (a, b):
        (d / "X_results_1.csv").write_text("epoch,acc\n1,90\n")
        # same metrics, different timestamps/walls -> still identical
        (d / "X_events.jsonl").write_text(json.dumps(
            {"kind": "epoch", "fold": 1, "epoch": 1, "train_loss": 0.5,
             "ts": hash(str(d)) % 1000, "epoch_seconds": 0.1}) + "\n")
    assert diff_runs.main([str(a), str(b)]) == 0
    (b / "X_results_1.csv").write_text("epoch,acc\n1,91\n")
    assert diff_runs.main([str(a), str(b)]) == 1


@pytest.mark.slow
def test_release_validation_dtype_flag(tmp_path):
    """--dtype bfloat16 threads through to the CV run and the summary
    records the completed protocol (2-epoch MUTAG smoke on CPU)."""
    from tools import release_validation

    release_validation.main([
        "MUTAG", "--out_root", str(tmp_path), "--num_epochs", "2",
        "--dtype", "bfloat16",
    ])
    lines = (tmp_path / "summary.jsonl").read_text().splitlines()
    row = json.loads(lines[-1])
    assert row["dataset"] == "MUTAG"
    assert np.isfinite(row["test_acc_mean"])


@pytest.mark.slow
def test_bench_scaling_mechanics():
    """bench_scaling runs end-to-end on a tiny virtual CPU mesh and emits
    well-formed efficiency JSON (subprocess: it must configure the
    platform before any backend touch)."""
    out = subprocess.run(
        [sys.executable, "tools/bench_scaling.py", "--data_type", "MUTAG",
         "--force_cpu", "2", "--meshes", "1,1", "2,1",
         "--epochs_per_dispatch", "1"],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = json.loads(out.stdout)
    assert [r["mesh"] for r in rows] == ["1,1", "2,1"]
    assert rows[0]["scaling_efficiency_pct"] == 100.0
    assert all(np.isfinite(r["edges_per_s"]) for r in rows)

def test_tensorboard_export_dedupes_replayed_epochs(tmp_path):
    """--resume replays epochs past the last checkpoint and re-appends
    their rows; the exporter must keep only the LAST (fold, epoch)
    occurrence (train/metrics.py consumer caveat)."""
    import pytest

    pytest.importorskip("tensorboardX")
    from dgcnn_tpu.train.tensorboard import export_events

    ev = tmp_path / "MUTAG_events.jsonl"
    row = {"kind": "epoch", "fold": 1, "ts": 1e9, "train_loss": 0.5,
           "test_loss": 0.6, "train_accuracy": 90.0, "test_accuracy": 85.0,
           "edges_per_second": 1e8, "epoch_seconds": 0.01}
    with open(ev, "w") as f:
        for e in (1, 2, 3):
            f.write(json.dumps({**row, "epoch": e}) + "\n")
        # crash + resume replays epochs 2-3 with different values
        for e in (2, 3):
            f.write(json.dumps({**row, "epoch": e, "train_loss": 0.1}) + "\n")
    n = export_events(str(ev), str(tmp_path / "runs"))
    assert n == 3 * 6  # 3 unique epochs, not 5


def test_predict_scaling_prints_table_and_json():
    """tools/predict_scaling.py (SCALING.md's v5e-8 efficiency model) must
    emit the markdown table plus one parseable JSON line whose entries
    stay in (0, 1] and cover all 8 datasets."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "predict_scaling.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    lines = proc.stdout.strip().splitlines()
    assert lines[0].startswith("| dataset |")
    data = json.loads(lines[-1])
    ds_rows = {k: v for k, v in data.items() if isinstance(v, dict)}
    assert len(ds_rows) == 8
    for name, row in ds_rows.items():
        assert 0.0 < row["eff8_overlap"] <= 1.0, (name, row)
        assert 0.0 < row["eff8_serial"] < 1.0, (name, row)
        assert row["eff8_serial"] <= row["eff8_overlap"] + 1e-9
    # fold-sharded lockstep table (round 5): zero-collective efficiency
    # K/(D·ceil(K/D)) incl. the padded D ∤ K hosts
    assert data["fold_eff_d2"] == 1.0
    assert data["fold_eff_d8"] == 0.625  # 10 folds pad to 16 on 8 chips
    assert data["fold_eff_d10"] == 1.0


def test_kernel_anatomy_variants_interpret_mode():
    """Every probe_kernel_anatomy kernel variant runs under the Pallas
    interpreter, and the 'base'/'unroll4' variants reproduce the library
    kernel's numbers — so the on-chip timings measure the real
    instruction mix, not a drifted copy."""
    import importlib.util

    import jax.numpy as jnp

    from dgcnn_tpu.kernels.spmm_block_coo import (
        build_block_coo,
        pad_weights,
        pad_weights_t,
        spmm_block_coo,
    )
    from dgcnn_tpu.utils.profiling import _batch_edges

    spec = importlib.util.spec_from_file_location(
        "probe_kernel_anatomy",
        os.path.join(_REPO, "tools", "probe_kernel_anatomy.py"),
    )
    pk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pk)
    make_kernel, forward = pk._variants()

    rng = np.random.default_rng(0)
    src, dst, w = _batch_edges(rng, 512, 2048)
    s = build_block_coo(src, dst, 512)
    w_pad = jnp.asarray(pad_weights(s, w))
    h = jnp.asarray(rng.normal(size=(512, 32)).astype(np.float32) * 0.01)
    lib = np.asarray(
        spmm_block_coo(s, w_pad, jnp.asarray(pad_weights_t(s, w)), h, True)
    )

    for mode, n_acc, exact in (
        ("base", 2, True), ("unroll4", 4, True), ("sel_const", 2, False),
        ("no_abuild", 2, False), ("no_ah", 2, False), ("empty", 2, False),
    ):
        out = np.asarray(forward(
            make_kernel(mode, n_acc), n_acc,
            s.row_ptr, s.item_c, s.ls, s.ld, w_pad, h, interpret=True,
        ))
        assert np.isfinite(out).all(), mode
        if exact:
            np.testing.assert_allclose(out, lib, rtol=1e-5, atol=1e-8,
                                       err_msg=mode)
