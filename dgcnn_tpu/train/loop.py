"""Jitted training / evaluation loops.

The reference iterates batches in Python, synchronizing the device twice per
batch via `loss.item()` / `.sum().item()` (reference train.py:35-45) — a
launch-latency-bound pattern. Here an entire epoch is ONE jitted program:
batches are pre-packed into a stacked pytree and `lax.scan` drives the step,
with loss/correct accumulated on device and a single host transfer per epoch
(SURVEY §3.2 note).

Contract parity with the reference loops:
  * loss per batch = NLLLoss mean over the batch's real graphs
    (train.py:39); the epoch metric is the *mean of per-batch means*
    (train.py:47,66), so a smaller final batch is over-weighted exactly as
    in the reference;
  * train accuracy is measured during training with dropout active
    (train.py:37,45);
  * optimizer update order: backward → step → zero_grad (train.py:40-42) ≡
    a single optax apply_updates.

Every engine layout (host-packed COO, device COO, dense, multi-tile dense,
block-sparse) shares ONE train-step body and ONE fused multi-epoch scaffold
(`_fused_run`), parameterized by how a scan element becomes a batch and how
the model is applied — the update rule and the [k, 4] metric-row contract
live in exactly one place.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from dgcnn_tpu.models.dgcnn import DGCNN, Params, apply


def nll_loss_and_correct(
    log_probs: jax.Array, y: jax.Array, graph_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Masked NLL (mean over real graphs) and correct-prediction count.

    The label pick is a one-hot contraction, NOT take_along_axis: the
    gather's backward is a scatter, and scatters under a fold-vmapped
    program lower poorly on TPU (the 2026-08-20 lockstep traces showed
    every batched gather/scatter serializing). The one-hot product's
    backward is a broadcast multiply; C ≤ 5 here, so the extra compare
    is free either way."""
    n = jnp.maximum(graph_mask.sum(), 1.0)
    onehot = jax.nn.one_hot(y, log_probs.shape[-1], dtype=log_probs.dtype)
    ll = (log_probs * onehot).sum(axis=-1)
    loss = -(ll * graph_mask).sum() / n
    pred = jnp.argmax(log_probs, axis=-1).astype(y.dtype)
    correct = ((pred == y).astype(jnp.float32) * graph_mask).sum()
    return loss, correct


def _make_step(batch_fn, loss_apply, optimizer):
    """The one train-step body every engine runs.

    batch_fn(data, x) → batch pytree (x is one scan element — a packed
    batch, an index row, or a tuple of per-class index rows);
    loss_apply(params, data, batch, dropout_rng) → (loss, correct).
    Returns `for_data(data) → step` so the fused runners can close the
    step over their traced device-resident dataset argument.
    """

    def for_data(data):
        def step(carry, x):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batch = batch_fn(data, x)

            def loss_fn(p):
                return loss_apply(p, data, batch, dropout_rng)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    return for_data


def _fused_run(batch_fn, loss_apply, eval_apply, optimizer):
    """The one fused multi-epoch scaffold: k epochs of train + per-epoch
    eval as a single jitted program.

        run(params, opt_state, rng, data, epochs_xs, test_xs)
            → (params, opt_state, rng, rows [k, 4])

    epochs_xs leaves carry [k, steps, ...]; test_xs leaves [t_steps, ...].
    rows = (train_loss, test_loss, train_correct, test_correct) per epoch —
    identical values to k sequential per-epoch dispatches (same RNG
    threading). A statically EMPTY test stream (benchmarks time training
    only) yields 0-valued eval columns, not the NaN a mean over zero scan
    outputs would produce.
    """
    step_for = _make_step(batch_fn, loss_apply, optimizer)

    @jax.jit
    def run(params, opt_state, rng, data, epochs_xs, test_xs):
        has_eval = jax.tree_util.tree_leaves(test_xs)[0].shape[0] > 0  # static

        def epoch(carry, xs):
            carry, (losses, corrects) = jax.lax.scan(step_for(data), carry, xs)
            params = carry[0]

            def eval_body(c, x):
                batch = batch_fn(data, x)
                return c, eval_apply(params, data, batch)

            if has_eval:
                _, (te_losses, te_corrects) = jax.lax.scan(
                    eval_body, None, test_xs
                )
                te_loss, te_correct = te_losses.mean(), te_corrects.sum()
            else:
                te_loss = te_correct = jnp.float32(0)
            row = jnp.stack([losses.mean(), te_loss, corrects.sum(), te_correct])
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), epochs_xs
        )
        return params, opt_state, rng, rows

    return run


def _coo_fns(model: DGCNN, spmm_impl: str):
    """(batch_fn, loss_apply, eval_apply) for PACKED batches (host COO):
    the scan element IS the batch; `data` is an unused placeholder."""

    def batch_fn(data, x):
        return x

    def loss_apply(p, data, batch, dropout_rng):
        lp = apply(
            p, model, batch, deterministic=False, dropout_rng=dropout_rng,
            spmm_impl=spmm_impl,
        )
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    def eval_apply(p, data, batch):
        lp = apply(p, model, batch, deterministic=True, spmm_impl=spmm_impl)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    return batch_fn, loss_apply, eval_apply


def make_train_epoch(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    spmm_impl: str = "xla",
) -> Callable:
    """Returns jitted `(params, opt_state, rng, batches) →
    (params, opt_state, rng, mean_loss, correct)` where `batches` is a
    GraphBatch pytree with a leading scan axis."""
    batch_fn, loss_apply, _ = _coo_fns(model, spmm_impl)
    step = _make_step(batch_fn, loss_apply, optimizer)(None)

    @jax.jit
    def train_epoch(params, opt_state, rng, batches):
        (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
            step, (params, opt_state, rng), batches
        )
        return params, opt_state, rng, losses.mean(), corrects.sum()

    return train_epoch


def make_coo_run(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    spmm_impl: str = "xla",
) -> Callable:
    """FUSED multi-epoch runner for the COO layout (the packed-batch
    counterpart of `make_dense_gather_run`): `batches` leaves carry TWO
    leading axes [k, steps, ...] — k host-packed epochs — and k epochs of
    train + eval execute as one jitted program.

        run(params, opt_state, rng, batches, test_batches)
            → (params, opt_state, rng, rows [k, 4])

    Unlike the dense path the epochs' batch data must be shipped to the
    device (batch composition changes with each shuffle), so callers chunk
    k by a transfer/memory budget (train/cv.py CooEngine.run_epochs)."""
    run = _fused_run(*_coo_fns(model, spmm_impl), optimizer)

    def run_packed(params, opt_state, rng, batches, test_batches):
        return run(params, opt_state, rng, 0, batches, test_batches)

    return run_packed


def make_multi_dense_run(
    model: DGCNN, optimizer: optax.GradientTransformation
) -> Callable:
    """FUSED multi-epoch runner over the size-bucketed multi-tile dense
    layout (batching/multi_dense.py): per step, every tile class gathers
    its slice of the batch from its device-resident DenseDataset and the
    model runs per class with a shared head (apply_multi_dense).

        run(params, opt_state, rng, class_data, orders, test_orders)
            → (params, opt_state, rng, rows [k, 4])

    class_data: tuple of DenseDataset (device); orders: tuple over
    classes of [k, steps, S_c] int32; test_orders: tuple of [t_steps, S_c].
    """
    from dgcnn_tpu.batching.dense import gather_dense_batch
    from dgcnn_tpu.models.dgcnn import apply_multi_dense

    def batch_fn(class_data, idx_rows):
        return tuple(
            gather_dense_batch(d, r) for d, r in zip(class_data, idx_rows)
        )

    def loss_apply(p, class_data, batches, dropout_rng):
        lp, y, gm = apply_multi_dense(
            p, model, batches, deterministic=False, dropout_rng=dropout_rng
        )
        return nll_loss_and_correct(lp, y, gm)

    def eval_apply(p, class_data, batches):
        lp, y, gm = apply_multi_dense(p, model, batches, deterministic=True)
        return nll_loss_and_correct(lp, y, gm)

    return _fused_run(batch_fn, loss_apply, eval_apply, optimizer)


def make_device_coo_run(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    bucket,
    spmm_impl: str = "xla",
) -> Callable:
    """FUSED multi-epoch runner over a device-resident COO graphset
    (batching/device_coo.py) — the COO twin of `make_dense_gather_run`:
    batches are assembled ON DEVICE from graph-id rows, so an epoch ships
    one [steps, slots] int32 matrix and k epochs of train + eval run as a
    single program.

        run(params, opt_state, rng, dev, order3d, test_order2d)
            → (params, opt_state, rng, rows [k, 4])
    """
    from dgcnn_tpu.batching.device_coo import gather_coo_batch

    def batch_fn(dev, idx_row):
        return gather_coo_batch(dev, idx_row, bucket)

    def loss_apply(p, dev, batch, dropout_rng):
        lp = apply(
            p, model, batch, deterministic=False, dropout_rng=dropout_rng,
            spmm_impl=spmm_impl,
        )
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    def eval_apply(p, dev, batch):
        lp = apply(p, model, batch, deterministic=True, spmm_impl=spmm_impl)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    return _fused_run(batch_fn, loss_apply, eval_apply, optimizer)


def make_block_run(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    nb_budget: int,
    w_budget: int,
    block_impl: str = "xla",
) -> Callable:
    """FUSED multi-epoch runner over a device-resident block-sparse
    graphset (batching/block_sparse.py) — same contract as
    `make_device_coo_run` (one [epochs, steps, slots] int32 tensor per
    chunk), but GCN propagation runs as batched MXU matmuls over
    nonzero-adjacency-block work items instead of per-edge gathers.

        run(params, opt_state, rng, dev, order3d, test_order2d)
            → (params, opt_state, rng, rows [k, 4])
    """
    from dgcnn_tpu.batching.block_sparse import gather_block_batch
    from dgcnn_tpu.models.dgcnn import apply_block

    def batch_fn(dev, idx_row):
        return gather_block_batch(dev, idx_row, nb_budget, w_budget)

    def loss_apply(p, dev, batch, dropout_rng):
        lp = apply_block(
            p, model, batch, dev.pool, deterministic=False,
            dropout_rng=dropout_rng, block_impl=block_impl,
        )
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    def eval_apply(p, dev, batch):
        lp = apply_block(p, model, batch, dev.pool, block_impl=block_impl)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    return _fused_run(batch_fn, loss_apply, eval_apply, optimizer)


def make_eval_epoch(model: DGCNN, spmm_impl: str = "xla") -> Callable:
    """Returns jitted `(params, batches) → (mean_loss, correct)` — the
    equivalent of the reference `test()` (train.py:49-66): eval mode
    (dropout off), no grad."""
    _, _, eval_apply = _coo_fns(model, spmm_impl)

    @jax.jit
    def eval_epoch(params: Params, batches):
        def body(carry, batch):
            return carry, eval_apply(params, None, batch)

        _, (losses, corrects) = jax.lax.scan(body, None, batches)
        return losses.mean(), corrects.sum()

    return eval_epoch


def _dense_fns(model: DGCNN):
    from dgcnn_tpu.batching.dense import gather_dense_batch

    def batch_fn(data, idx_row):
        return gather_dense_batch(data, idx_row)

    def loss_apply(p, data, batch, dropout_rng):
        lp = apply(p, model, batch, deterministic=False, dropout_rng=dropout_rng)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    def eval_apply(p, data, batch):
        lp = apply(p, model, batch, deterministic=True)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    return batch_fn, loss_apply, eval_apply


def make_dense_gather_epochs(
    model: DGCNN, optimizer: optax.GradientTransformation
) -> Tuple[Callable, Callable]:
    """Epoch runners over a device-resident DenseDataset
    (batching/dense.py): batches are gathered ON DEVICE from the epoch's
    shuffled index matrix, so the host ships [steps, slots] int32 per epoch
    and nothing else. Returns (train_epoch, eval_epoch):

        train_epoch(params, opt_state, rng, data, order2d)
            → (params, opt_state, rng, mean_loss, correct)
        eval_epoch(params, data, order2d) → (mean_loss, correct)
    """
    batch_fn, loss_apply, eval_apply = _dense_fns(model)
    step_for = _make_step(batch_fn, loss_apply, optimizer)

    @jax.jit
    def train_epoch(params, opt_state, rng, data, order2d):
        (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
            step_for(data), (params, opt_state, rng), order2d
        )
        return params, opt_state, rng, losses.mean(), corrects.sum()

    @jax.jit
    def eval_epoch(params, data, order2d):
        def body(carry, idx_row):
            return carry, eval_apply(params, data, batch_fn(data, idx_row))

        _, (losses, corrects) = jax.lax.scan(body, None, order2d)
        return losses.mean(), corrects.sum()

    return train_epoch, eval_epoch


def make_dense_gather_run(
    model: DGCNN, optimizer: optax.GradientTransformation
) -> Callable:
    """FUSED multi-epoch runner over a device-resident DenseDataset — the
    TPU answer to dispatch latency: on this transport a dispatch costs
    ~20-30 ms while a whole small-dataset epoch computes in single-digit
    ms, so the per-epoch APIs above are latency-bound. Here `k` epochs of
    train + eval (the reference's per-epoch protocol, train.py:113-116)
    run as ONE jitted program — an outer `lax.scan` over the per-epoch
    shuffle matrices — and per-epoch metrics come back as stacked arrays
    in a single host transfer.

        run(params, opt_state, rng, data, order3d, test_order2d)
            → (params, opt_state, rng, rows)

    order3d: [k, steps, slots] int32 (−1-padded) — epoch e trains on
    order3d[e]; test_order2d: [t_steps, slots] eval batches (fixed across
    epochs, reference train.py:109 shuffle=False). rows: [k, 4] fp32 =
    (train_loss, test_loss, train_correct, test_correct) per epoch —
    identical values to k sequential train_epoch/eval_epoch calls.
    """
    return _fused_run(*_dense_fns(model), optimizer)
