"""On-chip A/B: D&D on the device-COO engine vs the block-sparse default.

The weakest speedup row in RESULTS.md is D&D (41.4 ms/epoch, 1,561x on
the block-sparse engine — reference `README.md:128-138` row). Every other
layout has been A/B'd for DD (dense: doesn't fit single-tile; multi: 2.1x
slower than block — train/cv.py choose_layout) EXCEPT the COO path with
the block-pair Pallas kernel (kernels/spmm_block_coo.py), which became
the auto SpMM winner only after the block engine was chosen as the DD
default. DD's adjacency inside 128x128 blocks is ~1% dense (mean degree
~5), so the block engine's MXU work is ~99% padding; the COO kernel's
work scales with EDGES, not block area — this probe measures whether that
wins end-to-end.

Usage (repo root, chip up):  python tools/probe_dd_coo.py
Prints one JSON line: {"DD_block": ms, "DD_coo_auto": ms, "DD_coo_pallas": ms}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — shares its timing harness)


def main():
    from dgcnn_tpu.utils.platform import probe_accelerator

    if "--no-probe" not in sys.argv and not probe_accelerator(timeout_s=150.0):
        print("probe_dd_coo: accelerator probe FAILED", file=sys.stderr)
        return 1

    dd_train, _meta = bench._train_split("DD")
    edges = bench._epoch_edges(dd_train)
    out = {}
    # block engine first (the incumbent default) so a mid-run tunnel drop
    # still yields the baseline number
    for key, fn in (
        ("DD_block", lambda: bench._bench_block(dd_train)),
        ("DD_coo_auto", lambda: bench._bench_coo(dd_train, "auto")),
        ("DD_coo_pallas", lambda: bench._bench_coo(dd_train, "pallas")),
        ("DD_coo_xla", lambda: bench._bench_coo(dd_train, "xla")),
    ):
        try:
            best, times = fn()
        except Exception as exc:  # keep partial results on OOM/compile fail
            out[key] = {"error": repr(exc)[:200]}
            print(f"{key}: FAILED {exc!r}", file=sys.stderr)
            continue
        out[key] = {
            "epoch_ms": round(best * 1e3, 2),
            "edges_per_s": round(edges / best, 1),
            "times_ms": [round(t * 1e3, 2) for t in times],
        }
        print(f"{key}: {out[key]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
