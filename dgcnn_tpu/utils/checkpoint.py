"""Checkpoint save/restore.

The reference only ever *saves* per-fold weights (`torch.save(state_dict)`,
reference train.py:129) and never loads them — no resume path exists
(SURVEY §5). Here checkpoints are full training bundles
`(params, opt_state, epoch, rng)` so an interrupted 10-fold run resumes at
the exact fold/epoch boundary.

Storage is a single .npz of flattened pytree leaves plus a JSON treedef
manifest — dependency-light, atomic (every file write-temp-then-rename,
manifest BEFORE data so a crash between the two renames pairs the new
manifest with the previous valid .npz rather than a new .npz with no
guard), and readable without the framework. Validation is by leaf COUNT,
not shapes: resume bundles legitimately carry variable-length leaves
(the in-flight metric arrays) that the donor declares as length-0
placeholders. An orbax backend can be slotted in behind the same three
functions if multi-host async checkpointing is ever needed at this model
size (52k params).
"""

from __future__ import annotations

import json
import os
from typing import Any

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
    # manifest FIRST: if the process dies between the two renames, the new
    # manifest sits next to the PREVIOUS (still valid) .npz — for periodic
    # checkpoints of the same bundle kind that pair loads cleanly, and a
    # kind change surfaces as the leaf-count ValueError. The old order
    # (npz first) could leave a fresh .npz with a stale or absent
    # manifest, silently skipping the structure guard on resume.
    tmp_manifest = path + ".tmp.treedef.json"
    with open(tmp_manifest, "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)
    os.replace(tmp_manifest, path + ".treedef.json")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore a bundle saved by `save_checkpoint`, using `like` (a pytree of
    the same structure) as the structure donor. Raises ValueError when the
    on-disk bundle's leaf count disagrees with `like` — positional leaf
    loading would otherwise silently scramble a structurally different
    bundle into the donor tree. The count is checked against the npz
    itself as well as the manifest, so a missing manifest cannot skip the
    guard."""
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
        keys = [k for k in z.files if k.startswith("leaf_")]
        if len(keys) != len(leaves_like):
            raise ValueError(
                f"{path}: checkpoint npz has {len(keys)} leaves, expected "
                f"{len(leaves_like)} — wrong bundle kind for this donor"
            )
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path + ".npz")
