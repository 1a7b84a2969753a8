#!/usr/bin/env python
"""Pinned-trajectory regression artifact (VERDICT r4 #5).

The repo's learnability gates are coarse: planted-signal synthetics
train to ~100%, so a bug costing a few accuracy points (the size of the
reference's official-vs-repro deltas, reference README.md:106-127) can
pass every ≥70% gate. This module pins the EXACT 20-epoch training
trajectory (per-epoch loss/accuracy CSVs, the artifact contract of
reference train.py:113-136) of a fixed-seed synthetic MUTAG run on the
dense AND block fold-lockstep engines. Any math-changing edit shifts
the trajectory and trips tests/test_pinned_trajectory.py instead of
sailing through the coarse gates.

Regenerating (after an INTENTIONAL math change — say so in the commit):

    python tools/pinned_trajectory.py --write

The run is CPU-pinned: tests compare on the CPU backend, and the fast
gate must not depend on an attached accelerator.
"""

from __future__ import annotations

import argparse
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
_repo = os.path.dirname(_here)
sys.path.insert(0, _repo)

ARTIFACT_DIR = os.path.join(_repo, "tests", "data", "pinned_trajectory")
LAYOUTS = ("dense", "block")
NUM_FOLDS = 2
NUM_EPOCHS = 20


def _force_cpu():
    # the container's sitecustomize pins the axon TPU platform; override
    # before the first backend touch (same pattern as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")


def run_pinned(layout: str, workdir: str) -> dict:
    """Run the pinned config on `layout` fold-lockstep; returns
    {fold: csv_text} for the per-fold statistics CSVs."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = Config(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=NUM_EPOCHS,
        seed=324,
        num_folds=NUM_FOLDS,
        layout=layout,
        cv_parallel="folds",
        data_root=os.path.join(workdir, "data"),
        epochs_dir=os.path.join(workdir, layout, "epochs"),
        statistics_dir=os.path.join(workdir, layout, "statistics"),
        graph_pad_multiple=4,
    )
    run_cross_validation(cfg, dataset=gs)
    out = {}
    for fold in range(1, NUM_FOLDS + 1):
        path = os.path.join(
            cfg.statistics_dir, f"MUTAG_results_{fold}.csv"
        )
        with open(path) as f:
            out[fold] = f.read()
    return out


def artifact_path(layout: str, fold: int) -> str:
    return os.path.join(ARTIFACT_DIR, f"MUTAG_{layout}_fold{fold}.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--write", action="store_true",
                   help="regenerate the vendored artifacts")
    args = p.parse_args(argv)
    _force_cpu()

    import tempfile

    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        for layout in LAYOUTS:
            csvs = run_pinned(layout, td)
            for fold, text in csvs.items():
                path = artifact_path(layout, fold)
                if args.write:
                    with open(path, "w") as f:
                        f.write(text)
                    print(f"wrote {path}")
                else:
                    with open(path) as f:
                        want = f.read()
                    status = "MATCH" if want == text else "DIFFERS"
                    print(f"{path}: {status}")


if __name__ == "__main__":
    main()
