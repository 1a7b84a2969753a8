#!/usr/bin/env python
"""Run the full reference protocol (100 epochs × 10-fold CV, batch 50,
seed 324) for the given datasets and append one summary JSON line each —
the input for tools/release_report.py.

    python tools/release_validation.py --out_root /tmp/release MUTAG NCI1 ...

Resumable: pass the same --out_root again and completed folds are skipped
(checkpoint_resume). Artifacts land under <out_root>/{statistics,epochs};
summaries in <out_root>/summary.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("datasets", nargs="+")
    p.add_argument("--out_root", default="/tmp/release")
    p.add_argument("--data_root", default=None,
                   help="dataset root (default <out_root>/data)")
    p.add_argument("--num_epochs", default=100, type=int)
    p.add_argument("--resume", action="store_true",
                   help="skip completed folds from a previous run (forces "
                        "the sequential driver — fold-lockstep can't "
                        "resume per fold)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (bfloat16 = the documented mixed-"
                        "precision fast path; fp32 params/loss)")
    p.add_argument("--adj_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="storage dtype of device-resident adjacencies "
                        "(Config.adj_dtype; default mirrors the framework "
                        "default — auto = bf16 on TPU. A float32 default "
                        "here once silently measured fp32 DD at 70 ms/epoch "
                        "vs the framework default's 42)")
    p.add_argument("--block_impl", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="block-sparse propagation impl (Config.block_impl)")
    args = p.parse_args(argv)

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.train.cv import run_cross_validation

    os.makedirs(args.out_root, exist_ok=True)
    for ds in args.datasets:
        t0 = time.perf_counter()
        cfg = Config(
            data_type=ds,
            num_epochs=args.num_epochs,
            data_root=args.data_root or os.path.join(args.out_root, "data"),
            epochs_dir=os.path.join(args.out_root, "epochs"),
            statistics_dir=os.path.join(args.out_root, "statistics"),
            checkpoint_resume=args.resume,
            compute_dtype=args.dtype,
            adj_dtype=args.adj_dtype,
            block_impl=args.block_impl,
        )
        r = run_cross_validation(cfg, allow_synthetic=True)
        wall = time.perf_counter() - t0
        with open(os.path.join(args.out_root, "summary.jsonl"), "a") as f:
            f.write(json.dumps({
                "dataset": ds,
                "dtype": args.dtype,
                "adj_dtype": args.adj_dtype,
                "block_impl": args.block_impl,
                "wall_s": round(wall, 1),
                "test_acc_mean": r["test_accuracy_mean"],
                "test_acc_std": r["test_accuracy_std"],
                "train_acc_mean": r["train_accuracy_mean"],
            }) + "\n")
        print(ds, "done", round(wall, 1), "s")


if __name__ == "__main__":
    main()
