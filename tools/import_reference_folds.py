#!/usr/bin/env python
"""Bundle the canonical 10-fold CV index files into a compressed asset.

The reference experiment protocol uses fixed fold indices vendored from
muhanzhang/pytorch_DGCNN (reference data/<DS>/10fold_idx/{train,test}_idx-
<k>.txt, loaded at reference train.py:103-106; provenance README.md:26-27).
Those folds are load-bearing for accuracy parity — for MUTAG/PTC_MR/
PROTEINS/DD they are NOT an exact partition of the dataset (SURVEY §2a),
so stratified folds cannot reproduce the published numbers exactly.

This tool packs a checkout's `data/*/10fold_idx/*.txt` trees into
`dgcnn_tpu/assets/folds.npz` (keys `<DS>/<kind>_idx-<k>`), which
`dgcnn_tpu.data.folds.get_folds` uses automatically whenever no fold files
exist under the user's data root.

    python tools/import_reference_folds.py /path/to/DGCNN/data
"""

from __future__ import annotations

import os
import sys

import numpy as np

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dgcnn_tpu", "assets", "folds.npz",
)


def main(data_root: str) -> None:
    arrays = {}
    for ds in sorted(os.listdir(data_root)):
        fold_dir = os.path.join(data_root, ds, "10fold_idx")
        if not os.path.isdir(fold_dir):
            continue
        k = 1
        while True:
            paths = {
                kind: os.path.join(fold_dir, f"{kind}_idx-{k}.txt")
                for kind in ("train", "test")
            }
            if not all(os.path.exists(p) for p in paths.values()):
                break
            for kind, p in paths.items():
                arrays[f"{ds}/{kind}_idx-{k}"] = np.loadtxt(
                    p, dtype=np.int64
                ).reshape(-1)
            k += 1
        if k > 1:
            print(f"{ds}: {k - 1} folds")
    if not arrays:
        sys.exit(f"no 10fold_idx directories under {data_root}")
    os.makedirs(os.path.dirname(ASSET), exist_ok=True)
    np.savez_compressed(ASSET, **arrays)
    print(f"wrote {ASSET} ({os.path.getsize(ASSET)} bytes, {len(arrays)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data")
