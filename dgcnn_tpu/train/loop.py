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
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from dgcnn_tpu.batching.packer import GraphBatch
from dgcnn_tpu.models.dgcnn import DGCNN, Params, apply


def nll_loss_and_correct(
    log_probs: jax.Array, y: jax.Array, graph_mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Masked NLL (mean over real graphs) and correct-prediction count."""
    n = jnp.maximum(graph_mask.sum(), 1.0)
    ll = jnp.take_along_axis(log_probs, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    loss = -(ll * graph_mask).sum() / n
    pred = jnp.argmax(log_probs, axis=-1).astype(y.dtype)
    correct = ((pred == y).astype(jnp.float32) * graph_mask).sum()
    return loss, correct


def make_train_epoch(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    spmm_impl: str = "xla",
) -> Callable:
    """Returns jitted `(params, opt_state, rng, batches) →
    (params, opt_state, rng, mean_loss, correct)` where `batches` is a
    GraphBatch pytree with a leading scan axis."""

    def step(carry, batch: GraphBatch):
        params, opt_state, rng = carry
        rng, dropout_rng = jax.random.split(rng)

        def loss_fn(p):
            lp = apply(
                p,
                model,
                batch,
                deterministic=False,
                dropout_rng=dropout_rng,
                spmm_impl=spmm_impl,
            )
            loss, correct = nll_loss_and_correct(lp, batch.y, batch.graph_mask)
            return loss, correct

        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), (loss, correct)

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

    def step(carry, batch: GraphBatch):
        params, opt_state, rng = carry
        rng, dropout_rng = jax.random.split(rng)

        def loss_fn(p):
            lp = apply(
                p, model, batch, deterministic=False, dropout_rng=dropout_rng,
                spmm_impl=spmm_impl,
            )
            return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng), (loss, correct)

    @jax.jit
    def run(params, opt_state, rng, batches, test_batches):
        def epoch(carry, ebatches):
            carry, (losses, corrects) = jax.lax.scan(step, carry, ebatches)
            params = carry[0]

            def eval_body(c, batch):
                lp = apply(
                    params, model, batch, deterministic=True, spmm_impl=spmm_impl
                )
                return c, nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            _, (te_losses, te_corrects) = jax.lax.scan(
                eval_body, None, test_batches
            )
            row = jnp.stack(
                [losses.mean(), te_losses.mean(), corrects.sum(), te_corrects.sum()]
            )
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), batches
        )
        return params, opt_state, rng, rows

    return run


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

    def gather_all(class_data, idx_rows):
        return tuple(
            gather_dense_batch(d, r) for d, r in zip(class_data, idx_rows)
        )

    def train_step(class_data):
        def step(carry, idx_rows):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batches = gather_all(class_data, idx_rows)

            def loss_fn(p):
                lp, y, gm = apply_multi_dense(
                    p, model, batches, deterministic=False,
                    dropout_rng=dropout_rng,
                )
                return nll_loss_and_correct(lp, y, gm)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    @jax.jit
    def run(params, opt_state, rng, class_data, orders, test_orders):
        def epoch(carry, order_step):
            carry, (losses, corrects) = jax.lax.scan(
                train_step(class_data), carry, order_step
            )
            params = carry[0]

            def eval_body(c, idx_rows):
                lp, y, gm = apply_multi_dense(
                    params, model, gather_all(class_data, idx_rows),
                    deterministic=True,
                )
                return c, nll_loss_and_correct(lp, y, gm)

            _, (te_losses, te_corrects) = jax.lax.scan(
                eval_body, None, test_orders
            )
            row = jnp.stack(
                [losses.mean(), te_losses.mean(), corrects.sum(), te_corrects.sum()]
            )
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), orders
        )
        return params, opt_state, rng, rows

    return run


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

    def train_step(dev):
        def step(carry, idx_row):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batch = gather_coo_batch(dev, idx_row, bucket)

            def loss_fn(p):
                lp = apply(
                    p, model, batch, deterministic=False,
                    dropout_rng=dropout_rng, spmm_impl=spmm_impl,
                )
                return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    @jax.jit
    def run(params, opt_state, rng, dev, order3d, test_order2d):
        def epoch(carry, order2d):
            carry, (losses, corrects) = jax.lax.scan(
                train_step(dev), carry, order2d
            )
            params = carry[0]

            def eval_body(c, idx_row):
                batch = gather_coo_batch(dev, idx_row, bucket)
                lp = apply(
                    params, model, batch, deterministic=True, spmm_impl=spmm_impl
                )
                return c, nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            _, (te_losses, te_corrects) = jax.lax.scan(
                eval_body, None, test_order2d
            )
            row = jnp.stack(
                [losses.mean(), te_losses.mean(), corrects.sum(), te_corrects.sum()]
            )
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), order3d
        )
        return params, opt_state, rng, rows

    return run


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

    def train_step(dev):
        def step(carry, idx_row):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batch = gather_block_batch(dev, idx_row, nb_budget, w_budget)

            def loss_fn(p):
                lp = apply_block(
                    p, model, batch, dev.pool, deterministic=False,
                    dropout_rng=dropout_rng, block_impl=block_impl,
                )
                return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    @jax.jit
    def run(params, opt_state, rng, dev, order3d, test_order2d):
        def epoch(carry, order2d):
            carry, (losses, corrects) = jax.lax.scan(
                train_step(dev), carry, order2d
            )
            params = carry[0]

            def eval_body(c, idx_row):
                batch = gather_block_batch(dev, idx_row, nb_budget, w_budget)
                lp = apply_block(
                    params, model, batch, dev.pool, block_impl=block_impl
                )
                return c, nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            _, (te_losses, te_corrects) = jax.lax.scan(
                eval_body, None, test_order2d
            )
            row = jnp.stack(
                [losses.mean(), te_losses.mean(), corrects.sum(), te_corrects.sum()]
            )
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), order3d
        )
        return params, opt_state, rng, rows

    return run


def make_eval_epoch(model: DGCNN, spmm_impl: str = "xla") -> Callable:
    """Returns jitted `(params, batches) → (mean_loss, correct)` — the
    equivalent of the reference `test()` (train.py:49-66): eval mode
    (dropout off), no grad."""

    @jax.jit
    def eval_epoch(params: Params, batches):
        def body(carry, batch):
            lp = apply(params, model, batch, deterministic=True, spmm_impl=spmm_impl)
            loss, correct = nll_loss_and_correct(lp, batch.y, batch.graph_mask)
            return carry, (loss, correct)

        _, (losses, corrects) = jax.lax.scan(body, None, batches)
        return losses.mean(), corrects.sum()

    return eval_epoch


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
    from dgcnn_tpu.batching.dense import gather_dense_batch

    def train_step(data):
        def step(carry, idx_row):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batch = gather_dense_batch(data, idx_row)

            def loss_fn(p):
                lp = apply(
                    p, model, batch, deterministic=False, dropout_rng=dropout_rng
                )
                return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    @jax.jit
    def train_epoch(params, opt_state, rng, data, order2d):
        (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
            train_step(data), (params, opt_state, rng), order2d
        )
        return params, opt_state, rng, losses.mean(), corrects.sum()

    @jax.jit
    def eval_epoch(params, data, order2d):
        def body(carry, idx_row):
            batch = gather_dense_batch(data, idx_row)
            lp = apply(params, model, batch, deterministic=True)
            return carry, nll_loss_and_correct(lp, batch.y, batch.graph_mask)

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
    from dgcnn_tpu.batching.dense import gather_dense_batch

    def train_step(data):
        def step(carry, idx_row):
            params, opt_state, rng = carry
            rng, dropout_rng = jax.random.split(rng)
            batch = gather_dense_batch(data, idx_row)

            def loss_fn(p):
                lp = apply(
                    p, model, batch, deterministic=False, dropout_rng=dropout_rng
                )
                return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        return step

    @jax.jit
    def run(params, opt_state, rng, data, order3d, test_order2d):
        def epoch(carry, order2d):
            (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
                train_step(data), carry, order2d
            )

            def eval_body(c, idx_row):
                batch = gather_dense_batch(data, idx_row)
                lp = apply(params, model, batch, deterministic=True)
                return c, nll_loss_and_correct(lp, batch.y, batch.graph_mask)

            _, (te_losses, te_corrects) = jax.lax.scan(
                eval_body, None, test_order2d
            )
            row = jnp.stack(
                [losses.mean(), te_losses.mean(), corrects.sum(), te_corrects.sum()]
            )
            return (params, opt_state, rng), row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), order3d
        )
        return params, opt_state, rng, rows

    return run
