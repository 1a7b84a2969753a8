"""COLLAB synthetic-signal sweep (VERDICT r2 #9).

COLLAB is the only synthetic row outside its real-data reference band
(64.88% vs 73.76±0.49): generator v3's profile-faithful sizing gave its
three classes heavy size overlap, and degree-only features (SURVEY §2d:
COLLAB has no node labels/attrs) + per-graph degree normalization +
top-k SortPooling erase most other distributional signals. The two
levers the generator has left are the class-dependent degree
ASSORTATIVITY span (`assort`, default 0.7) and the symmetric per-class
size shift (`size_shift`, default 0.2 — symmetric around the profile
mean, so avg_nodes stays faithful at any strength).

This probe trains a subset CV (first `--folds` folds, `--epochs` epochs)
for each (assort, size_shift) candidate on-chip and reports test
accuracy, answering: can a stronger planted signal reach the reference
band without distorting the profile's shape statistics, or is the band
unreachable for a degree-only generative family (in which case
RESULTS.md documents the measured ceiling)?

Usage (repo root, chip up):
    python tools/probe_collab_signal.py [--epochs 40] [--folds 3]
Prints one JSON line {"a<assort>_s<shift>": test_acc_mean, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--no-probe", action="store_true")
    args = ap.parse_args(argv)

    from dgcnn_tpu.utils.platform import probe_accelerator

    if not args.no_probe and not probe_accelerator(timeout_s=150.0):
        print("probe_collab_signal: accelerator probe FAILED", file=sys.stderr)
        print(json.dumps({"error": "probe_failed"}))
        return 1

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data import synthetic
    from dgcnn_tpu.train.cv import run_cross_validation

    # generator-v4 sweep: the clique ego-network family (the real
    # COLLAB generative process) vs the v3 two-block control, plus
    # clique-size/separation variations and a no-size-shift ablation
    # (pure local-structure signal). Keys name the overrides.
    candidates = {
        "two_block_default": dict(),  # the measured optimum (69.6%)
        "cliques_f35_sep2": dict(family="cliques"),
        "cliques_f25_sep3": dict(family="cliques", clique_frac=0.25,
                                 clique_sep=3.0),
        "cliques_f45_sep2": dict(family="cliques", clique_frac=0.45,
                                 clique_sep=2.0),
        "cliques_f35_sep2_noshift": dict(family="cliques", size_shift=0.0),
    }
    out = {}
    base = dict(synthetic.PROFILES["COLLAB"])
    try:
        for key, overrides in candidates.items():
            synthetic.PROFILES["COLLAB"] = dict(base, **overrides)
            gs = synthetic.synthesize_tu_dataset("COLLAB", seed=0)
            with tempfile.TemporaryDirectory() as td:
                result = run_cross_validation(
                    Config(
                        data_type="COLLAB",
                        num_epochs=args.epochs,
                        num_folds=args.folds,
                        data_root=f"{td}/data",
                        epochs_dir=f"{td}/epochs",
                        statistics_dir=f"{td}/statistics",
                    ),
                    dataset=gs,
                )
            out[key] = {
                "test_acc": round(float(result["test_accuracy_mean"]), 2),
                "test_std": round(float(result["test_accuracy_std"]), 2),
                "mean_nodes": round(float(np.diff(gs.node_ptr).mean()), 1),
            }
            print(f"{key}: {out[key]}", file=sys.stderr)
    finally:
        synthetic.PROFILES["COLLAB"] = base
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
