"""Fold/step-batched SpMM roofline (VERDICT r3 #3).

The block-pair COO kernel's round-3 anatomy put its residual bound in
each work item's A-build → A@h dependence shadow: the A-build contraction
is per-item fixed cost, so at F=32 lanes it dominates and the kernel sits
at ~15% of HBM speed-of-light. The A-build cost is INDEPENDENT of the
feature width, and `spmm_block_coo` is F-generic — so fold/step-batching
is pure shape: stack K independent feature sets along the lane axis
(h [N, K·F]) and every built A block serves K·F lanes. This is the shape
the fold-lockstep engines feed conceptually (K folds × F=32 layer width
→ 320 lanes; K folds × 97 concat channels → 970) and the measured
answer to "push %-of-SoL past 40%".

On-chip record (2026-08-20, v5e, NCI1-shaped batch structure n=1792
e=7168, 3 trials each):

    F=32  (single fold):      ~17 µs/op,   14-16% of SoL  (the r3 bound)
    F=320 (10 folds × 32):    13-24 µs/op, 29-53% (below the harness's
                              clean-signal floor — high variance)
    F=640:                    24-27 µs/op, 41-47%
    F=960 (10 folds × 97):    32-33 µs/op, **54.6-57.0%** of SoL
                              (~450 GB/s), ~17× the useful bytes of the
                              F=32 row at ~2× the time

Scope limits, measured/derived honestly:
  * DD-scale shapes cannot run fold-stacked — the kernel's VMEM
    residency gate fails (h alone is 27648×320×4 B ≈ 35 MB ≫ 12 MB
    budget); DD stays on the block-pool engine.
  * COLLAB has F=1, so a 10-fold stack is only 10 lanes — no
    amortization is available there.

Usage (repo root, chip up):
    python tools/probe_spmm_foldbatch.py [--trials 3]
Prints one JSON line {"f32": {...}, "f320": {...}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--no-probe", action="store_true")
    args = ap.parse_args(argv)

    from dgcnn_tpu.utils.platform import probe_accelerator

    if not args.no_probe and not probe_accelerator(timeout_s=150.0):
        print("probe_spmm_foldbatch: accelerator probe FAILED", file=sys.stderr)
        print(json.dumps({"error": "probe_failed"}))
        return 1

    from dgcnn_tpu.utils.profiling import spmm_microbench

    out = {}
    for f in (32, 320, 640, 960):
        us, sol, weak = [], [], False
        for _ in range(args.trials):
            r = spmm_microbench(
                num_nodes=1792, num_features=f, num_edges=7168,
                impl="pallas", reps=6, structure_kind="batch",
            )
            us.append(r["us_per_op"])
            sol.append(r["pct_of_sol"])
            weak = weak or bool(r.get("weak_signal"))
        row = {
            "us_per_op_median": round(float(np.median(us)), 1),
            "pct_of_sol_median": round(float(np.median(sol)), 2),
            "pct_of_sol_min": round(float(np.min(sol)), 2),
            "pct_of_sol_max": round(float(np.max(sol)), 2),
        }
        if weak:
            row["weak_signal"] = True
        out[f"f{f}"] = row
        print(f"f{f}: {row}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
