"""One-hot vs segment-sum SpMM break-even sweep over node count.

The COO dispatcher's one-hot gate (`ops/spmm.py _ONEHOT_MAX_NF`) prices
the MXU one-hot formulation by N·F: its per-edge cost is 4·N·F MXU
FLOPs (selector matrices span all N nodes), while the take+segment_sum
path is roughly N-independent per edge. The DD layout probe
(tools/probe_dd_coo.py, 2026-08-20) showed the 800 K constant is
mis-calibrated at large N: DD COO batches (N_pad ≈ 14 K, F = 32 →
N·F ≈ 458 K, under the gate) ran 2.5× SLOWER with one-hot engaged
(844 vs 331 ms/epoch).

This sweep measures both impls on batch-structured graphs across N at
F = 32, E = 4·N (DD-like density) with the standard
unroll+floor-subtraction microbench, to recalibrate the constant from
data rather than the FLOP model alone (effective one-hot throughput is
well below MXU peak at these shapes).

Usage (repo root, chip up): python tools/probe_onehot_breakeven.py
Prints one JSON line {"N2048_onehot": us, "N2048_xla": us, ...}
(or {"error": "probe_failed"}).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from dgcnn_tpu.utils.platform import probe_accelerator

    if "--no-probe" not in sys.argv and not probe_accelerator(timeout_s=150.0):
        print("probe_onehot_breakeven: accelerator probe FAILED",
              file=sys.stderr)
        print(json.dumps({"error": "probe_failed"}))
        return 1

    from dgcnn_tpu.utils.profiling import spmm_microbench

    out = {}
    for n in (2048, 4096, 8192, 16384):
        for impl in ("onehot", "xla"):
            try:
                r = spmm_microbench(
                    num_nodes=n, num_features=32, num_edges=4 * n,
                    impl=impl, structure_kind="batch",
                )
                out[f"N{n}_{impl}"] = round(r["us_per_op"], 1)
            except Exception as exc:
                out[f"N{n}_{impl}"] = {"error": repr(exc)[:200]}
            print(f"N{n} {impl}: {out[f'N{n}_{impl}']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
