"""Full-scale real-data ingestion dress rehearsal (VERDICT r2 #4).

The framework's real-data path (TU zip → `tools/fetch_datasets.py
--from_zip` → strict stats verify → npz cache → `train.py`) had only
ever been exercised on toy fixtures (tests/test_data.py) — the build
environment has no egress, so a real TU download is impossible here.
This tool proves the path AT DATASET SCALE with the one TU-format corpus
we can produce offline: the synthetic profile written out as genuine TU
text files (reference format, README.md:24-27; writer
`data/tu_parser.py write_tu_format`).

Flow (default NCI1 — 4,110 graphs, ~123 K nodes, ~270 K directed edges):

  1. synthesize the full-scale profile GraphSet;
  2. recover the TU raw pieces (node labels from the one-hot block,
     attrs columns) and write `<name>_A.txt` etc., zipped exactly like a
     TU-Dortmund download (top-level `<name>/` directory);
  3. `fetch_one(--from_zip)` → parse + STRICT published-stats verify +
     cache — the identical code path a user with egress runs;
  4. reload from the cache and assert the round-tripped GraphSet is
     BYTE-IDENTICAL to the generated one (features, topology, labels);
  5. (--train) run the real CLI (`train.py --data_type <name>`) against
     the ingested cache and assert it completes with finite accuracy.

On a machine WITH egress the equivalent one-command rehearsal against
the real corpus is:

    python tools/fetch_datasets.py --root data NCI1 && \
    python train.py --data_type NCI1

Usage:  python tools/dress_rehearsal.py [--name NCI1] [--train]
Prints one JSON line with the verified counts (or {"error": ...}).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgcnn_tpu.data.synthetic import PROFILES, synthesize_tu_dataset  # noqa: E402
from dgcnn_tpu.data.tu_parser import write_tu_format  # noqa: E402


def make_tu_zip(gs, name: str, out_dir: str) -> str:
    """GraphSet → `<out_dir>/<name>.zip` with the TU download layout
    (top-level `<name>/` holding the `_*.txt` files)."""
    prof = PROFILES[name]
    n_attrs, n_labels = prof["num_attrs"], prof["num_node_labels"]
    attrs = gs.x[:, :n_attrs].astype(np.float32) if n_attrs else None
    labels = (
        np.argmax(gs.x[:, n_attrs: n_attrs + n_labels], axis=1)
        if n_labels
        else None
    )
    raw = os.path.join(out_dir, "_tu_raw", name)
    write_tu_format(
        raw, name, gs.node_ptr, gs.edge_src, gs.edge_dst, gs.edge_ptr,
        gs.y, node_labels=labels, node_attrs=attrs,
    )
    zip_path = os.path.join(out_dir, f"{name}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for fn in sorted(os.listdir(raw)):
            z.write(os.path.join(raw, fn), arcname=f"{name}/{fn}")
    shutil.rmtree(os.path.join(out_dir, "_tu_raw"))
    return zip_path


def run(name: str, root: str, train: bool, train_epochs: int = 3) -> dict:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from fetch_datasets import fetch_one

    from dgcnn_tpu.data.datasets import load_dataset

    gs = synthesize_tu_dataset(name, num_graphs=None, seed=0)

    with tempfile.TemporaryDirectory() as td:
        zip_path = make_tu_zip(gs, name, td)
        zip_bytes = os.path.getsize(zip_path)
        if not fetch_one(name, root, from_zip=zip_path):
            raise RuntimeError("fetch_one failed")

    loaded, meta = load_dataset(
        name, root, allow_download=False, allow_synthetic=False,
        strict_stats=True,
    )
    assert meta.source == "cache", meta
    # byte-identical round trip: generator → TU text → parser → cache
    np.testing.assert_array_equal(loaded.x, gs.x)
    np.testing.assert_array_equal(loaded.node_ptr, gs.node_ptr)
    np.testing.assert_array_equal(loaded.edge_src, gs.edge_src)
    np.testing.assert_array_equal(loaded.edge_dst, gs.edge_dst)
    np.testing.assert_array_equal(loaded.edge_ptr, gs.edge_ptr)
    np.testing.assert_array_equal(loaded.y, gs.y)
    assert loaded.num_classes == gs.num_classes

    out = {
        "name": name,
        "graphs": int(loaded.num_graphs),
        "nodes": int(loaded.node_ptr[-1]),
        "edges": int(loaded.edge_ptr[-1]),
        "zip_bytes": int(zip_bytes),
        "round_trip": "byte_identical",
    }

    if train:
        # the REAL CLI against the ingested cache — a fresh process so
        # the platform/default-device logic runs exactly as a user's
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with tempfile.TemporaryDirectory() as td:
            proc = subprocess.run(
                [
                    sys.executable, os.path.join(repo, "train.py"),
                    "--data_type", name,
                    "--num_epochs", str(train_epochs),
                    "--data_root", root,
                    "--out_root", td,
                ],
                capture_output=True, text=True, timeout=1500, env=env,
                cwd=repo,
            )
        if proc.returncode != 0:
            raise RuntimeError(
                f"train.py failed ({proc.returncode}):\n{proc.stdout[-2000:]}"
                f"\n{proc.stderr[-2000:]}"
            )
        line = [
            ln for ln in proc.stdout.splitlines()
            if "Overall" in ln and "Accuracy" in ln
        ]
        out["cli"] = line[-1].strip() if line else "completed"
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="NCI1", choices=sorted(PROFILES))
    ap.add_argument("--root", default=None,
                    help="dataset root (default: a temp dir, cleaned up)")
    ap.add_argument("--train", action="store_true",
                    help="also run the train.py CLI against the ingested cache")
    ap.add_argument("--train_epochs", type=int, default=3)
    args = ap.parse_args(argv)

    td = None
    root = args.root
    if root is None:
        td = tempfile.mkdtemp(prefix="dress_rehearsal_")
        root = os.path.join(td, "data")
    try:
        out = run(args.name, root, args.train, args.train_epochs)
    except Exception as exc:  # one parseable line either way
        print(json.dumps({"error": repr(exc)[:300]}))
        raise
    finally:
        if td is not None:
            shutil.rmtree(td, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
