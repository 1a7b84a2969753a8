"""Flattened optimizer wrapper — one fused elementwise update chain.

The reference's Adam runs per-tensor CUDA kernels (torch.optim.Adam over
13 parameter tensors — reference train.py:99). The TPU cost model is
different: inside the fused train step every *kernel launch* costs ~1-2 µs
regardless of size, and XLA cannot fuse elementwise chains across leaves
of different shapes — so a 13-leaf Adam update lowers to ~13 small fused
chains per step. This wrapper ravels grads/params into ONE vector
(`jax.flatten_util.ravel_pytree`), runs the wrapped optax transformation
on it as a single fused chain over ~52K contiguous elements, and unravels
the updates. Adam (and any other elementwise transformation) computes
bitwise-identical updates on the raveled vector — pinned by
tests/test_train.py::test_flat_adam_matches_per_leaf_adam.

Note the optimizer STATE becomes vector-shaped (mu/nu [P]), so resume
bundles written with one setting do not load under the other
(utils/checkpoint.py validates the bundle's leaf COUNT and fails
loudly — the flattened state has a different count than per-leaf Adam).
"""

from __future__ import annotations

import jax
import optax
from jax.flatten_util import ravel_pytree


def flatten_optimizer(optimizer: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap `optimizer` to run on the raveled vector of its input pytree.

    Correct for any transformation whose update is elementwise over leaves
    (adam/sgd/rmsprop/...); NOT for transformations that depend on leaf
    boundaries (per-layer clipping, lars/lamb trust ratios)."""

    def init(params):
        return optimizer.init(ravel_pytree(params)[0])

    def update(grads, state, params=None):
        gflat, unravel = ravel_pytree(grads)
        pflat = None if params is None else ravel_pytree(params)[0]
        uflat, state = optimizer.update(gflat, state, pflat)
        return unravel(uflat), state

    return optax.GradientTransformation(init, update)
