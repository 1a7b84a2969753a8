#!/usr/bin/env python
"""Fetch-and-verify TU benchmark datasets (the real-data ingestion story
— PyG TUDataset's download role, reference train.py:81-87 / README.md:24-26).

    # on a machine WITH network egress:
    python tools/fetch_datasets.py --root /path/to/data MUTAG NCI1 ...
    python tools/fetch_datasets.py --root /path/to/data --all

    # then copy <root> to the training machine (this build env has no
    # egress) and run: python train.py --data_type MUTAG --data_root <root>

Also accepts an already-downloaded TU zip (the offline hand-off path —
no network touched at all):

    python tools/fetch_datasets.py --root data --from_zip ~/Downloads/MUTAG.zip

Every ingested dataset is parsed immediately and STRICTLY verified
against the published benchmark stats (graph/class/feature counts,
reference README.md:62-94) before its processed cache is written — a
truncated download or wrong archive fails here, not mid-training. The
verified cache makes training runs byte-stable afterwards.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ingest_zip(zip_path: str, root: str, name: str) -> None:
    """Extract a TU zip into <root>/<name>/raw/ (same layout as
    data/datasets.py _download)."""
    from dgcnn_tpu.data.datasets import _has_raw, _raw_dir

    extract_root = os.path.join(root, name, "_extract")
    try:
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(extract_root)
        src = os.path.join(extract_root, name)
        if not os.path.isdir(src):
            raise ValueError(
                f"{zip_path}: no top-level {name}/ directory in archive"
            )
        raw = _raw_dir(root, name)
        os.makedirs(raw, exist_ok=True)
        for fn in os.listdir(src):
            os.replace(os.path.join(src, fn), os.path.join(raw, fn))
        if not _has_raw(raw, name):
            raise ValueError(f"{zip_path}: archive missing required TU files")
    finally:
        shutil.rmtree(extract_root, ignore_errors=True)


def fetch_one(name: str, root: str, from_zip: str | None = None) -> bool:
    """Download (or ingest) + parse + STRICT stats verify + cache one
    dataset. Returns True on success."""
    from dgcnn_tpu.data.datasets import (
        _cache_path,
        _download,
        _has_raw,
        _raw_dir,
        verify_dataset_stats,
    )
    from dgcnn_tpu.data.graphset import GraphSet
    from dgcnn_tpu.data.tu_parser import parse_tu_dir

    raw = _raw_dir(root, name)
    if from_zip is not None:
        _ingest_zip(from_zip, root, name)
        print(f"{name}: ingested from {from_zip}")
    elif _has_raw(raw, name):
        print(f"{name}: raw files already present")
    elif _download(root, name):
        print(f"{name}: downloaded")
    else:
        print(f"{name}: FAILED — no raw files and download failed "
              f"(no egress? use --from_zip)")
        return False

    gs = parse_tu_dir(raw, name, use_node_attr=True)
    verify_dataset_stats(name, gs, use_node_attr=True, strict=True)
    cache = _cache_path(root, name, use_node_attr=True)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    gs.to_npz(cache)
    print(f"{name}: verified ({gs.num_graphs} graphs, "
          f"{gs.num_classes} classes, {gs.num_features} features) "
          f"→ cached {cache}")
    return True


def main(argv=None):
    from dgcnn_tpu.data.datasets import DATASET_STATS

    p = argparse.ArgumentParser()
    p.add_argument("datasets", nargs="*", help="dataset names (see --all)")
    p.add_argument("--root", default="data")
    p.add_argument("--all", action="store_true",
                   help=f"fetch all benchmarks: {', '.join(DATASET_STATS)}")
    p.add_argument("--from_zip", default=None,
                   help="ingest this local TU zip instead of downloading "
                        "(single dataset; name inferred from the filename "
                        "unless exactly one dataset argument is given)")
    args = p.parse_args(argv)

    names = list(DATASET_STATS) if args.all else args.datasets
    if args.from_zip and not names:
        names = [os.path.splitext(os.path.basename(args.from_zip))[0]]
    if not names:
        p.error("give dataset names, --all, or --from_zip")
    if args.from_zip and len(names) != 1:
        p.error("--from_zip ingests exactly one dataset")

    ok = True
    for name in names:
        if name not in DATASET_STATS:
            print(f"{name}: unknown (choices: {', '.join(DATASET_STATS)})")
            ok = False
            continue
        ok &= fetch_one(name, args.root, args.from_zip)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
