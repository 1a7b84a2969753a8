#!/usr/bin/env python
"""Sustained on-chip soak of the multi-tile fold-lockstep program
(VERDICT r4 #3: it intermittently crashed the remote TPU worker in
round 4; the COLLAB pod-recipe leg runs exactly this program).

Runs the REAL production program (run_cross_validation with
layout=multi, cv_parallel=folds) with max_fused_epochs forced down so
one run issues many independent dispatches — the crash was
dispatch-correlated, so a ≥100-dispatch soak either reproduces it or
certifies the path. Prints one JSON line with the dispatch count and
outcome; nonzero exit on any failure.

    python tools/soak_multi_lockstep.py [--epochs 200] [--fused 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="COLLAB")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--fused", type=int, default=2,
                   help="max_fused_epochs → dispatches = epochs/fused")
    p.add_argument("--num_graphs", type=int, default=0,
                   help="0 = the dataset's real graph count")
    args = p.parse_args(argv)

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.train.cv import run_cross_validation

    gs, meta = load_dataset(
        args.data_type, allow_download=False, allow_synthetic=True,
    )
    if args.num_graphs:
        import numpy as np

        gs = gs.subset(np.arange(min(args.num_graphs, gs.num_graphs)))

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        cfg = Config(
            data_type=args.data_type,
            num_epochs=args.epochs,
            layout="multi",
            cv_parallel="folds",
            max_fused_epochs=args.fused,
            data_root=os.path.join(td, "data"),
            epochs_dir=os.path.join(td, "epochs"),
            statistics_dir=os.path.join(td, "statistics"),
            log_every=0,
        )
        try:
            result = run_cross_validation(cfg, dataset=gs)
            ok = True
            err = None
        except BaseException as exc:  # noqa: BLE001 - soak must report
            ok = False
            err = repr(exc)
            result = None
    print(json.dumps({
        "soak": "multi_fold_lockstep",
        "data_type": args.data_type,
        "source": meta.source,
        "dispatches": -(-args.epochs // args.fused),
        "epochs": args.epochs,
        "ok": ok,
        "error": err,
        "wall_s": round(time.time() - t0, 1),
        "test_acc_mean": (
            round(result["test_accuracy_mean"], 2) if result else None
        ),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
