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

MEASURED (2026-08-20, v5e, synthetic DD profile, 6-epoch fused dispatches):

    DD_block      42.08 ms/epoch   36.9 M edges/s   ← incumbent WINS
    DD_coo_xla   331.10 ms/epoch    4.7 M edges/s   (7.9x slower)
    DD_coo_pallas 331.01 ms/epoch   4.7 M edges/s   (per-edge kernels'
                  fit gates fail at DD shapes → same segment-sum path)
    DD_coo_auto  844.23 ms/epoch    1.8 M edges/s   (one-hot engaged on
                  DD's large node blocks — see _ONEHOT_MAX_NF note below)

The hypothesis this probe was built to test (block engine ~99% padding on
DD's ~1%-dense blocks → edge-proportional COO should win) is REFUTED
end-to-end: the MXU's padding-tolerant block matmuls beat every per-edge
formulation by ~8x at DD scale. The block-pair Pallas kernel
(kernels/spmm_block_coo.py) cannot even enter: its VMEM-residency gate
fails on DD buckets (h alone ≈ 14 K nodes x 128 lanes x 4 B ≈ 7 MB,
over the 12 MB budget with the index streams) — device-COO assembly
carries no host-built structures anyway. DD's default layout stays
"block"; the probe also exposed that COO-auto's one-hot gate is
counterproductive at DD node counts (844 vs 331 ms) — the auto
dispatcher only sees per-batch N*F, which DD's 90-feature input column
keeps under the gate while the true cost scales with N (fixed by
tightening _ONEHOT_MAX_NF usage? no — COO is not DD's layout; recorded
as a known non-default-path wart).

Usage (repo root, chip up):  python tools/probe_dd_coo.py
Prints one JSON line with four keys — DD_block, DD_coo_auto, DD_coo_pallas,
DD_coo_xla — each either {"epoch_ms": .., "edges_per_s": .., "times_ms": [..]}
or, for a benchmark that failed (OOM/compile/tunnel drop), {"error": "..."}.
If the accelerator probe itself fails, the single stdout line is
{"error": "probe_failed"} and the exit code is 1.
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
        print(json.dumps({"error": "probe_failed"}))
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
