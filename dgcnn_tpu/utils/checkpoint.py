"""Checkpoint save/restore.

The reference only ever *saves* per-fold weights (`torch.save(state_dict)`,
reference train.py:129) and never loads them — no resume path exists
(SURVEY §5). Here checkpoints are full training bundles
`(params, opt_state, epoch, rng)` so an interrupted 10-fold run resumes at
the exact fold/epoch boundary.

Storage is a single .npz of flattened pytree leaves plus a JSON treedef
manifest — dependency-light, atomic (write-temp-then-rename), and readable
without the framework. An orbax backend can be slotted in behind the same
three functions if multi-host async checkpointing is ever needed at this
model size (52k params).
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, bundle: Any) -> None:
    """Atomically write a pytree bundle to `<path>.npz` (+ structure json)."""
    leaves, treedef = _flatten_with_paths(bundle)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    # the manifest is temp+renamed too: a kill mid-write must never leave
    # a TORN json next to a valid .npz (load would crash on JSONDecodeError
    # instead of reporting a clean leaf-count mismatch)
    tmp_manifest = path + ".tmp.treedef.json"
    with open(tmp_manifest, "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)
    os.replace(tmp_manifest, path + ".treedef.json")


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a bundle saved by `save_checkpoint`, using `like` (a pytree of
    the same structure) as the structure donor. Raises ValueError when the
    on-disk bundle's leaf count disagrees with `like` — positional leaf
    loading would otherwise silently scramble a structurally different
    bundle into the donor tree."""
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    manifest = path + ".treedef.json"
    if os.path.exists(manifest):
        with open(manifest) as f:
            num_saved = json.load(f)["num_leaves"]
        if num_saved != len(leaves_like):
            raise ValueError(
                f"{path}: checkpoint has {num_saved} leaves, expected "
                f"{len(leaves_like)} — wrong bundle kind for this donor"
            )
    with np.load(path + ".npz") as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path + ".npz")
