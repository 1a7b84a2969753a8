#!/usr/bin/env python
"""Byte-compare the artifacts of two training runs.

The framework claims bitwise run-to-run determinism (README
"Reproducibility"; jit purity + explicit PRNG keys — the TPU-native
equivalent of the reference's set_determ.py). This tool makes the claim
checkable in one command:

    python train.py --data_type MUTAG --synthetic  # artifacts -> runA/
    python train.py --data_type MUTAG --synthetic  # artifacts -> runB/
    python tools/diff_runs.py runA/statistics runB/statistics

Exit code 0 = every common CSV is byte-identical (and both runs produced
the same file set); 1 otherwise, with a per-file report. JSONL event
streams are compared on their metric fields only (timestamps and wall
times legitimately differ between runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

METRIC_KEYS = ("kind", "fold", "epoch", "train_loss", "test_loss",
               "train_accuracy", "test_accuracy")


def _events_metrics(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            rows.append(tuple(ev.get(k) for k in METRIC_KEYS))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    args = p.parse_args(argv)

    ok = True
    names_a = sorted(os.listdir(args.dir_a))
    names_b = sorted(os.listdir(args.dir_b))
    for missing, where in ((set(names_a) - set(names_b), args.dir_b),
                           (set(names_b) - set(names_a), args.dir_a)):
        for n in sorted(missing):
            print(f"MISSING  {n} (not in {where})")
            ok = False

    for name in sorted(set(names_a) & set(names_b)):
        a, b = os.path.join(args.dir_a, name), os.path.join(args.dir_b, name)
        if not (os.path.isfile(a) and os.path.isfile(b)):
            continue
        if name.endswith(".jsonl"):
            same = _events_metrics(a) == _events_metrics(b)
            label = "metrics-identical" if same else "METRICS DIFFER"
        elif name.endswith(".png"):
            continue  # plots embed timestamps; covered by the CSVs
        else:
            same = open(a, "rb").read() == open(b, "rb").read()
            label = "byte-identical" if same else "DIFFERS"
        print(f"{'OK      ' if same else 'FAIL    '}{name}: {label}")
        ok = ok and same

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
