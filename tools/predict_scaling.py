"""Concrete v5e-8 scaling prediction (VERDICT r2 #6).

Builds the per-dataset efficiency model SCALING.md publishes: measured
single-chip step times (RESULTS.md 2026-08-19/20 release validation)
against the communication a v5e-8 slice would add per step, using public
v5e interconnect characteristics. Prints the markdown table SCALING.md
embeds plus one JSON line for tooling.

Model (all per optimizer step):

  t_step(1 chip)   = epoch_ms / ceil(0.9 * graphs / batch50)   [measured]
  t_comm(grad AR)  = ring all-reduce of the replicated grads:
                     2 * (D-1)/D * 208 KB / link_bw + hop latency
  t_comm(halo)     = --layout halo only: per GCN layer 2 ppermutes of
                     H boundary rows -> 2 * H * sum(F_l) * 4 B fwd, x2 for
                     the backward's transposed exchange
  eff_overlap(D)   = t/D / max(t/D, t_comm)     [XLA latency-hiding
                     scheduler overlaps collectives with independent
                     per-layer compute - the design case]
  eff_serial(D)    = t/D / (t/D + t_comm)       [no-overlap floor]

Constants: v5e ICI = 4 links/chip, 2D torus (v5e-8 = 2x4), ~45 GB/s
one-way per link, ~1 us per-hop collective latency; grads = 52k params
fp32 = 208 KB (replicated; the optimizer step is exactly the global-batch
update - parallel/train_dp.py).

These are PREDICTIONS: the build environment exposes one physical chip
(SCALING.md "Measuring edges/s scaling"), so the table is the testable
claim a pod run would check, not a measurement. The mechanics (that the
sharded programs partition and stay exact) are what the virtual-mesh
runbook commands verify.

Usage: python tools/predict_scaling.py
"""

from __future__ import annotations

import json
import math

# (dataset, measured ms/epoch single chip, graphs, max-graph nodes H)
# epoch times: RESULTS.md release validation 2026-08-21 (round-5
# defaults — flat-path row-block SortPooling prefilter, fold-lockstep
# dense+block, one-hot selection; synthetic profiles, chip v5e);
# H: published dataset stats (largest graph's node count — the halo
# width is a dataset constant, batching/shard_pack.py). Keep in sync
# with the RESULTS.md table whenever it is re-measured.
ROWS = [
    ("MUTAG", 0.3, 188, 28),
    ("PTC_MR", 0.3, 344, 109),
    ("NCI1", 2.7, 4110, 111),
    ("PROTEINS", 1.9, 1113, 620),
    ("DD", 36.1, 1178, 5748),
    ("COLLAB", 13.9, 5000, 492),
    ("IMDB-BINARY", 0.7, 1000, 136),
    ("IMDB-MULTI", 1.1, 1500, 89),
]

LINK_BW = 45e9          # B/s one-way per ICI link (v5e)
HOP_LAT = 1e-6          # s per collective hop
GRAD_BYTES = 208_000    # 52k params fp32
SUM_F = 97              # per-layer halo rows span all 4 layers' channels
BATCH = 50


def grad_ar_seconds(d: int) -> float:
    """Bidirectional-ring all-reduce of the replicated gradient."""
    return 2 * (d - 1) / d * GRAD_BYTES / LINK_BW + 2 * (d - 1) * HOP_LAT


def halo_seconds(h: int) -> float:
    """Per-step halo exchange under --layout halo: 2 ppermutes of H rows
    per layer forward + the transposed pair backward."""
    return 2 * (2 * h * SUM_F * 4) / LINK_BW + 8 * HOP_LAT


def fold_shard_eff(d: int, k: int = 10) -> float:
    """Fold-sharded lockstep efficiency on a (D, 1) mesh: ZERO
    collectives (folds are independent), so the only loss is fold-axis
    padding when D ∤ K — the runner pads K up to ceil(K/D)·D masked
    folds (train/cv_vmap.py, round 5), and every device executes
    ceil(K/D) fold-programs. eff = K / (D · ceil(K/D))."""
    return k / (d * math.ceil(k / d))


def print_fold_table() -> dict:
    print()
    print("| fold-sharded lockstep (K=10) | D=2 | D=3 | D=4 | D=5 "
          "| D=8 | D=10 |")
    print("|---|---|---|---|---|---|---|")
    row = {d: fold_shard_eff(d) for d in (2, 3, 4, 5, 8, 10)}
    print("| efficiency (zero-collective) | "
          + " | ".join(f"{row[d] * 100:.0f}%" for d in (2, 3, 4, 5, 8, 10))
          + " |")
    return {f"fold_eff_d{d}": round(v, 3) for d, v in row.items()}


def main() -> int:
    print("| dataset | t_step 1-chip | grad-AR | eff@2 | eff@4 | eff@8 "
          "| eff@8 floor | halo/step (G=2) |")
    print("|---|---|---|---|---|---|---|---|")
    out = {}
    for name, epoch_ms, graphs, h in ROWS:
        steps = math.ceil(0.9 * graphs / BATCH)
        t = epoch_ms / 1e3 / steps
        effs = {}
        for d in (2, 4, 8):
            ar = grad_ar_seconds(d)
            effs[d] = {
                "overlap": (t / d) / max(t / d, ar),
                "serial": (t / d) / (t / d + ar),
            }
        halo_us = halo_seconds(h) * 1e6
        print(
            f"| {name} | {t * 1e6:.0f} µs | {grad_ar_seconds(8) * 1e6:.0f} µs"
            f" | {effs[2]['overlap'] * 100:.0f}%"
            f" | {effs[4]['overlap'] * 100:.0f}%"
            f" | {effs[8]['overlap'] * 100:.0f}%"
            f" | {effs[8]['serial'] * 100:.0f}%"
            f" | {halo_us:.0f} µs |"
        )
        out[name] = {
            "t_step_us": round(t * 1e6, 1),
            "eff8_overlap": round(effs[8]["overlap"], 3),
            "eff8_serial": round(effs[8]["serial"], 3),
            "halo_us_g2": round(halo_us, 1),
        }
    out.update(print_fold_table())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
