"""Mesh-sharded training: data parallelism × edge-partitioned graphs.

New capability with no reference counterpart (the reference is strictly
single-device — SURVEY §2e). The training *protocol* is preserved exactly:
one global batch per optimizer step, loss = mean NLL over that batch's real
graphs. The mesh only changes WHERE the work runs:

  * each "data"-axis device computes the forward/backward for its balanced
    sub-batch; `psum(loss_sum)/psum(count)` reproduces the global-batch
    mean, and autodiff through `shard_map` inserts the matching gradient
    all-reduces over ICI;
  * each "graph"-axis device segment-sums its contiguous slice of a
    sub-batch's adjacency over the replicated node block; one psum per
    GCN layer reconstitutes the exact aggregate (spmm edge_axis path).

The optimizer update itself runs on replicated params outside shard_map —
XLA keeps it fused into the same program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dgcnn_tpu.models.dgcnn import DGCNN, apply
from dgcnn_tpu.parallel.shard import batch_pspecs, local_view


def _loss_terms(log_probs, y, graph_mask):
    ll = jnp.take_along_axis(log_probs, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    loss_sum = -(ll * graph_mask).sum()
    pred = jnp.argmax(log_probs, axis=-1).astype(y.dtype)
    correct = ((pred == y).astype(jnp.float32) * graph_mask).sum()
    return loss_sum, correct


def make_sharded_loss(model: DGCNN, mesh: Mesh, spmm_impl: str = "xla",
                      deterministic: bool = False) -> Callable:
    """(params, step_batch, rng) → (global mean loss, correct count).

    `step_batch` leaves are laid out per `batch_pspecs(scan_axis=False)`.
    Differentiable: `jax.grad` through the shard_map yields exact
    global-batch gradients (replicated)."""
    # psum over a size-1 axis is a no-op, so the edge stream is always
    # declared "graph"-partitioned — this also gives check_vma its
    # replication proof for the scalar outputs.
    edge_axis = "graph"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), batch_pspecs(scan_axis=False), P()),
        out_specs=(P(), P()),
    )
    def sharded(params, batch, rng):
        local = local_view(batch)
        dropout_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        lp = apply(
            params,
            model,
            local,
            deterministic=deterministic,
            dropout_rng=None if deterministic else dropout_rng,
            spmm_impl=spmm_impl,
            edge_axis=edge_axis,
        )
        loss_sum, correct = _loss_terms(lp, local.y, local.graph_mask)
        total = jnp.maximum(jax.lax.psum(local.graph_mask.sum(), "data"), 1.0)
        loss = jax.lax.psum(loss_sum, "data") / total
        correct = jax.lax.psum(correct, "data")
        return loss, correct

    return sharded


def make_dp_train_epoch(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    spmm_impl: str = "xla",
) -> Callable:
    """Jitted `(params, opt_state, rng, batches) → (params, opt_state, rng,
    mean_loss, correct)`; `batches` laid out per `pack_epoch_dp`."""
    sharded_loss = make_sharded_loss(model, mesh, spmm_impl, deterministic=False)

    def step(carry, batch):
        params, opt_state, rng = carry
        rng, sub = jax.random.split(rng)
        (loss, correct), grads = jax.value_and_grad(
            lambda p: sharded_loss(p, batch, sub), has_aux=True
        )(params)
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


def make_dp_eval_epoch(model: DGCNN, mesh: Mesh, spmm_impl: str = "xla") -> Callable:
    sharded_loss = make_sharded_loss(model, mesh, spmm_impl, deterministic=True)
    dummy = jax.random.PRNGKey(0)

    @jax.jit
    def eval_epoch(params, batches):
        def body(carry, batch):
            loss, correct = sharded_loss(params, batch, dummy)
            return carry, (loss, correct)

        _, (losses, corrects) = jax.lax.scan(body, None, batches)
        return losses.mean(), corrects.sum()

    return eval_epoch


def _make_dense_dp_loss(model: DGCNN, mesh: Mesh, deterministic: bool) -> Callable:
    """(params, data, idx_rows [n_data, slots], rng) → replicated
    (global mean loss, correct count) — each "data"-axis device gathers and
    evaluates its own sub-batch from the replicated DenseDataset."""
    from dgcnn_tpu.batching.dense import gather_dense_batch

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P()),
    )
    def f(params, data, idx_row, rng):
        if idx_row.shape[0] != 1:
            raise ValueError(
                f"per-device order block has {idx_row.shape[0]} rows; the "
                "order matrix must carry exactly mesh-data-axis rows per "
                "step (parallel/shard.py local_view) — extra rows would be "
                "silently dropped"
            )
        batch = gather_dense_batch(data, idx_row[0])
        dropout_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        lp = apply(
            params,
            model,
            batch,
            deterministic=deterministic,
            dropout_rng=None if deterministic else dropout_rng,
        )
        loss_sum, correct = _loss_terms(lp, batch.y, batch.graph_mask)
        total = jnp.maximum(jax.lax.psum(batch.graph_mask.sum(), "data"), 1.0)
        loss = jax.lax.psum(loss_sum, "data") / total
        correct = jax.lax.psum(correct, "data")
        # the graph axis never sees varying data here; pmean is the
        # replication proof for check_vma, numerically a no-op
        return jax.lax.pmean(loss, "graph"), jax.lax.pmean(correct, "graph")

    return f


def make_dense_dp_epochs(model: DGCNN, optimizer: optax.GradientTransformation,
                         mesh: Mesh):
    """Data-parallel epoch runners over a REPLICATED device-resident
    DenseDataset: each "data"-axis device gathers its own sub-batch rows
    from the epoch's index matrix slice and computes its shard of the
    global batch; psum(loss_sum)/psum(count) preserves exact global-batch
    semantics (the graph axis is unused — dense propagation is a batched
    matmul, already MXU-parallel).

        train_epoch(params, opt_state, rng, data, order3d)
            with order3d [steps, n_data, slots]
        eval_epoch(params, data, order3d)
    """
    train_loss = _make_dense_dp_loss(model, mesh, deterministic=False)
    eval_loss = _make_dense_dp_loss(model, mesh, deterministic=True)

    @jax.jit
    def train_epoch(params, opt_state, rng, data, order3d):
        def step(carry, idx_rows):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, correct), grads = jax.value_and_grad(
                lambda p: train_loss(p, data, idx_rows, sub), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        (params, opt_state, rng), (losses, corrects) = jax.lax.scan(
            step, (params, opt_state, rng), order3d
        )
        return params, opt_state, rng, losses.mean(), corrects.sum()

    @jax.jit
    def eval_epoch(params, data, order3d):
        dummy = jax.random.PRNGKey(0)

        def body(carry, idx_rows):
            return carry, eval_loss(params, data, idx_rows, dummy)

        _, (losses, corrects) = jax.lax.scan(body, None, order3d)
        return losses.mean(), corrects.sum()

    return train_epoch, eval_epoch


def _make_fused_dp_run(
    train_loss: Callable, eval_loss: Callable,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Shared fused multi-epoch runner skeleton for the sharded engines:
    `run(params, opt_state, rng, data, orders, test_orders)` scans epochs
    (outer) and steps (inner), evaluates per epoch, and returns stacked
    [k, 4] metric rows. `train_loss/eval_loss(params, data, xs, rng)` are
    the only variation points between the dense and device-COO mesh
    paths."""
    dummy = jax.random.PRNGKey(0)

    @jax.jit
    def run(params, opt_state, rng, data, orders, test_orders):
        def train_step(carry, xs):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, correct), grads = jax.value_and_grad(
                lambda p: train_loss(p, data, xs, sub), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), (loss, correct)

        # statically empty test stream (train-only benchmarking): eval
        # columns are 0, not a NaN mean over zero scan outputs — the same
        # contract as the single-chip twin (train/loop.py _fused_run)
        has_eval = jax.tree_util.tree_leaves(test_orders)[0].shape[0] > 0

        def epoch(carry, epoch_orders):
            carry, (losses, corrects) = jax.lax.scan(
                train_step, carry, epoch_orders
            )
            params = carry[0]

            def eval_body(c, xs):
                return c, eval_loss(params, data, xs, dummy)

            if has_eval:
                _, (te_losses, te_corrects) = jax.lax.scan(
                    eval_body, None, test_orders
                )
                te_loss, te_correct = te_losses.mean(), te_corrects.sum()
            else:
                te_loss = te_correct = jnp.float32(0)
            row = jnp.stack([losses.mean(), te_loss, corrects.sum(), te_correct])
            return carry, row

        (params, opt_state, rng), rows = jax.lax.scan(
            epoch, (params, opt_state, rng), orders
        )
        return params, opt_state, rng, rows

    return run


def make_dense_dp_run(model: DGCNN, optimizer: optax.GradientTransformation,
                      mesh: Mesh) -> Callable:
    """FUSED multi-epoch mesh runner (the sharded counterpart of
    train/loop.py make_dense_gather_run): k epochs of data-parallel
    train + eval as ONE jitted program, per-epoch metrics returned stacked.

        run(params, opt_state, rng, data, order4d, test_order3d)
            → (params, opt_state, rng, rows [k, 4])

    order4d: [k, steps, n_data, slots] (sharded P(None, None, "data"));
    test_order3d: [t_steps, n_data, slots]. Rows are identical to k
    sequential make_dense_dp_epochs calls."""
    return _make_fused_dp_run(
        _make_dense_dp_loss(model, mesh, deterministic=False),
        _make_dense_dp_loss(model, mesh, deterministic=True),
        optimizer,
    )


def _make_device_coo_dp_loss(model: DGCNN, mesh: Mesh, bucket, spmm_impl: str,
                             deterministic: bool) -> Callable:
    """(params, dev, idx_rows [n_data, slots_local], rng) → replicated
    (global mean loss, correct). Each "data"-axis device assembles its own
    sub-batch ON DEVICE from the replicated DeviceGraphSet
    (batching/device_coo.py); each "graph"-axis device aggregates its
    contiguous chunk of the sub-batch's dst-sorted edge stream, psum'd per
    GCN layer (the spmm edge_axis path)."""
    from dgcnn_tpu.batching.device_coo import gather_coo_batch

    n_graph = mesh.shape["graph"]
    if bucket.num_edges % n_graph:
        raise ValueError(f"bucket edges {bucket.num_edges} % n_graph {n_graph}")
    chunk = bucket.num_edges // n_graph

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P()),
    )
    def f(params, dev, idx_row, rng):
        # each graph-axis device assembles ONLY its contiguous edge chunk
        # (node arrays are replicated; materializing all e_pad edges and
        # slicing would do n_graph× the assembly work per device)
        gi = jax.lax.axis_index("graph")
        if idx_row.shape[0] != 1:
            raise ValueError(
                f"per-device order block has {idx_row.shape[0]} rows; the "
                "order matrix must carry exactly mesh-data-axis rows per "
                "step (parallel/shard.py local_view) — extra rows would be "
                "silently dropped"
            )
        local = gather_coo_batch(
            dev, idx_row[0], bucket, edge_window=(gi * chunk, chunk)
        )
        dropout_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        lp = apply(
            params,
            model,
            local,
            deterministic=deterministic,
            dropout_rng=None if deterministic else dropout_rng,
            spmm_impl=spmm_impl,
            edge_axis="graph",
        )
        loss_sum, correct = _loss_terms(lp, local.y, local.graph_mask)
        total = jnp.maximum(jax.lax.psum(local.graph_mask.sum(), "data"), 1.0)
        loss = jax.lax.psum(loss_sum, "data") / total
        correct = jax.lax.psum(correct, "data")
        return jax.lax.pmean(loss, "graph"), jax.lax.pmean(correct, "graph")

    return f


def make_device_coo_dp_run(model: DGCNN, optimizer: optax.GradientTransformation,
                           mesh: Mesh, bucket, spmm_impl: str = "xla") -> Callable:
    """FUSED multi-epoch mesh runner over a replicated device-resident COO
    graphset — the multi-chip twin of train/loop.py make_device_coo_run.

        run(params, opt_state, rng, dev, order4d, test_order3d)
            → (params, opt_state, rng, rows [k, 4])

    order4d: [k, steps, n_data, slots_local] int32, sharded
    P(None, None, "data"); test_order3d: [t_steps, n_data, slots_local]."""
    return _make_fused_dp_run(
        _make_device_coo_dp_loss(model, mesh, bucket, spmm_impl, False),
        _make_device_coo_dp_loss(model, mesh, bucket, spmm_impl, True),
        optimizer,
    )


def _make_block_dp_loss(model: DGCNN, mesh: Mesh, nb_budget: int,
                        w_budget: int, deterministic: bool,
                        block_impl: str = "xla") -> Callable:
    """(params, dev, idx_rows [n_data, slots_local], rng) → replicated
    (global mean loss, correct). Each "data"-axis device assembles its own
    sub-batch ON DEVICE from the replicated BlockGraphSet
    (batching/block_sparse.py) and runs the block-sparse trunk; the graph
    axis is unused — block propagation is a batched MXU matmul over work
    items, already MXU-parallel (same stance as the dense DP loss)."""
    from dgcnn_tpu.batching.block_sparse import gather_block_batch
    from dgcnn_tpu.models.dgcnn import apply_block

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P()),
    )
    def f(params, dev, idx_row, rng):
        if idx_row.shape[0] != 1:
            raise ValueError(
                f"per-device order block has {idx_row.shape[0]} rows; the "
                "order matrix must carry exactly mesh-data-axis rows per "
                "step (parallel/shard.py local_view) — extra rows would be "
                "silently dropped"
            )
        batch = gather_block_batch(dev, idx_row[0], nb_budget, w_budget)
        dropout_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        lp = apply_block(
            params,
            model,
            batch,
            dev.pool,
            deterministic=deterministic,
            dropout_rng=None if deterministic else dropout_rng,
            block_impl=block_impl,
        )
        loss_sum, correct = _loss_terms(lp, batch.y, batch.graph_mask)
        total = jnp.maximum(jax.lax.psum(batch.graph_mask.sum(), "data"), 1.0)
        loss = jax.lax.psum(loss_sum, "data") / total
        correct = jax.lax.psum(correct, "data")
        # the graph axis never sees varying data; pmean is the replication
        # proof for check_vma, numerically a no-op
        return jax.lax.pmean(loss, "graph"), jax.lax.pmean(correct, "graph")

    return f


def make_block_dp_run(model: DGCNN, optimizer: optax.GradientTransformation,
                      mesh: Mesh, nb_budget: int, w_budget: int,
                      block_impl: str = "xla") -> Callable:
    """FUSED multi-epoch mesh runner over a replicated block-sparse
    graphset — the multi-chip twin of train/loop.py make_block_run.

        run(params, opt_state, rng, dev, order4d, test_order3d)
            → (params, opt_state, rng, rows [k, 4])

    order4d: [k, steps, n_data, slots_local] int32, sharded
    P(None, None, "data"); test_order3d: [t_steps, n_data, slots_local]."""
    return _make_fused_dp_run(
        _make_block_dp_loss(model, mesh, nb_budget, w_budget, False, block_impl),
        _make_block_dp_loss(model, mesh, nb_budget, w_budget, True, block_impl),
        optimizer,
    )


def device_put_epoch(batches, mesh: Mesh):
    """Place a packed epoch on the mesh with the canonical shardings."""
    specs = batch_pspecs(scan_axis=True)
    return jax.tree_util.tree_map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        batches,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
