#!/usr/bin/env python
"""Export training event streams to TensorBoard event files.

    python tools/export_tensorboard.py statistics/MUTAG_events.jsonl [...] \
        --logdir runs

Then: `tensorboard --logdir runs`. See dgcnn_tpu/train/tensorboard.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("events", nargs="+", help="statistics/<DS>_events.jsonl files")
    p.add_argument("--logdir", default="runs")
    args = p.parse_args(argv)

    from dgcnn_tpu.train.tensorboard import export_events

    for path in args.events:
        n = export_events(path, args.logdir)
        print(f"{path}: {n} scalar points -> {args.logdir}")


if __name__ == "__main__":
    main()
