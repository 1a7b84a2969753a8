#!/usr/bin/env python
"""Repo-root entry point, same invocation shape as the reference:

    python train.py --data_type MUTAG --batch_size 50 --num_epochs 100 --seed 324
"""

from dgcnn_tpu.cli import main

if __name__ == "__main__":
    main()
