"""On-chip A/B: fused dense-trunk Pallas kernel vs the XLA einsum chain.

Drives the EXACT bench helpers (bench.py _bench_multi/_bench_dense — the
fused multi-epoch dispatch protocol the CV driver runs) on the two
dense-layout headline datasets:

  - COLLAB on the multi-tile engine (its framework default, sequential
    folds) — the shape the kernel was built for (~100%-of-SoL adjacency
    stream at T=256/512 tiles, RESULTS.md round-4 notes);
  - NCI1 on the single-tile dense engine, single-fold form (the
    lockstep program is fold-vmapped and does not route the kernel).

Decides Config.resolved_dense_trunk's "auto" arm. Run on the real chip:

    python tools/probe_dense_trunk.py [trials]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for name, fn in (("COLLAB", bench._bench_multi),
                     ("NCI1", bench._bench_dense)):
        train, _meta = bench._train_split(name)
        for impl in ("xla", "fused"):
            per = []
            for t in range(trials):
                best, _times = fn(train, dense_trunk=impl)
                per.append(best * 1e3)
                print(f"{name} {impl} trial{t}: {best * 1e3:.2f} ms",
                      flush=True)
            rows.append((name, impl, min(per), per))
    print("\n=== summary (per-epoch ms, best of trials) ===")
    for name, impl, best, per in rows:
        print(f"{name:8s} {impl:6s} best={best:7.2f}  "
              f"trials={[round(p, 2) for p in per]}")


if __name__ == "__main__":
    main()
