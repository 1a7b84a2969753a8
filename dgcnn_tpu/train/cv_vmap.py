"""Fold-vectorized cross-validation — train all K folds in lockstep.

The reference experiment is K=10 *independent* trainings of a ~52k-param
model over the same dataset (reference train.py:93-140). On TPU that is
embarrassingly vmappable: stacking the folds onto a leading axis turns
every tiny per-step op (the per-step fixed overhead that dominates a
single 52k-param training) into a K×-larger batched op with the SAME op
count — close to K× throughput on small datasets.

Per-fold protocol is preserved exactly:
  * fold f uses the same PRNG streams as the sequential driver
    (`fold_in(PRNGKey(seed), f)` for init/dropout, `SeedSequence([seed,
    f])` for shuffles) — dropout masks are bit-identical per fold;
  * folds with fewer train/test batches than the lockstep maximum see
    padded all-(−1) batch rows whose loss/gradient contribution is zero
    AND whose optimizer update is masked out (Adam moments must not decay
    on skipped steps), so each fold performs exactly its own number of
    updates;
  * per-fold metric rows equal the sequential engine's output
    (tests/test_cv_vmap.py).

Artifacts match the sequential driver (same CSVs, checkpoints, events);
they are written at run end instead of per fold, and the event stream is
ordered by epoch rather than by fold.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import optax

from dgcnn_tpu.batching.dense import (
    build_dense_dataset_on_device,
    dense_tile,
    gather_dense_batch,
    order_matrix,
)
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.graphset import GraphSet
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.train.loop import nll_loss_and_correct
from dgcnn_tpu.train.metrics import EventLog, FoldMetrics
from dgcnn_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


def _make_lockstep_body(
    optimizer: optax.GradientTransformation,
    grads_all: Callable,
    eval_all: Callable,
) -> Callable:
    """Layout-generic fused multi-epoch runner over a fold axis F
    (un-jitted — callers jit it directly or wrap it in shard_map first).

        run(params_f, opt_f, rng_f, data, order4d, test_order3d)
            → (params_f, opt_f, rng_f, rows)

    grads_all(params_f, data, idx_rows, drop_f) → ((loss_f, corr_f),
    grads_f) computes every fold's loss/grads for one lockstep step;
    eval_all(params_f, data, idx_rows) → (loss_f, corr_f) likewise for
    eval. params_f/opt_f/rng_f: pytrees with leading fold axis F
    (per-fold optimizer state, so masked folds keep their own Adam
    counts); order4d: [k, steps, F, slots] (−1-padded; an all-(−1) row
    is a skipped step for that fold); test_order3d: [t_steps, F, slots];
    rows: [k, F, 4] = (train_loss, test_loss, train_correct,
    test_correct) per epoch per fold.

    Folds are independent, so the fold axis partitions over a mesh
    "data" axis with ZERO collectives — the SCALING.md "fold-lockstep ×
    DP" pod recipe's fold half (the reference fold loop train.py:93-109
    is embarrassingly parallel). The dense runner relies on jit
    auto-partitioning of its fold-batched ops; the block runner wraps
    this body in shard_map (its merged item stream is per-device)."""

    def masked_update(real, grads, opt_state, params):
        """One optimizer step, applied only when `real` (scalar bool) —
        a skipped fold's params AND moments stay untouched."""
        updates, new_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jnp.where(real, new, old)
        return (
            jtu.tree_map(keep, new_params, params),
            jtu.tree_map(keep, new_state, opt_state),
        )

    def real_folds(idx_rows):
        # [F] bool: does fold f have any real graph in this step? idx_rows
        # is [F, slots] or a pytree of per-class [F, S_c] (multi layout)
        leaves = jtu.tree_leaves(idx_rows)
        r = (leaves[0] >= 0).any(axis=-1)
        for m in leaves[1:]:
            r = r | (m >= 0).any(axis=-1)
        return r

    def run(params_f, opt_f, rng_f, data, order4d, test_order3d):
        def step(carry, idx_rows):  # idx_rows [F, slots] (or pytree)
            params_f, opt_f, rng_f = carry
            keys = jax.vmap(jax.random.split)(rng_f)  # [F, 2, key]
            real = real_folds(idx_rows)  # [F]
            # folds skipping this step must NOT consume a PRNG split —
            # the sequential driver splits once per REAL step, and the
            # per-fold dropout streams must match it exactly
            rng_f = jnp.where(real[:, None], keys[:, 0], rng_f)
            drop_f = keys[:, 1]
            (loss_f, corr_f), grads_f = grads_all(
                params_f, data, idx_rows, drop_f
            )
            params_f, opt_f = jax.vmap(masked_update)(
                real, grads_f, opt_f, params_f
            )
            rf = real.astype(jnp.float32)
            return (params_f, opt_f, rng_f), (loss_f * rf, corr_f * rf, rf)

        def epoch(carry, order3d):  # order3d [steps, F, slots]
            carry, (losses, corrects, reals) = jax.lax.scan(step, carry, order3d)
            params_f = carry[0]

            def eval_body(c, idx_rows):
                loss_f, corr_f = eval_all(params_f, data, idx_rows)
                rf = real_folds(idx_rows).astype(jnp.float32)
                return c, (loss_f * rf, corr_f * rf, rf)

            _, (te_losses, te_corrects, te_reals) = jax.lax.scan(
                eval_body, None, test_order3d
            )
            row = jnp.stack(
                [
                    losses.sum(0) / jnp.maximum(reals.sum(0), 1.0),
                    te_losses.sum(0) / jnp.maximum(te_reals.sum(0), 1.0),
                    corrects.sum(0),
                    te_corrects.sum(0),
                ],
                axis=-1,
            )  # [F, 4]
            return carry, row

        (params_f, opt_f, rng_f), rows = jax.lax.scan(
            epoch, (params_f, opt_f, rng_f), order4d
        )
        return params_f, opt_f, rng_f, rows

    return run


def _force_xla_trunk(model: DGCNN) -> DGCNN:
    """Lockstep runners vmap the whole apply over the fold axis, which
    would batch the fused trunk's pallas grid (kernels/dense_trunk.py
    grids over the slot axis of ONE batch) — not a supported/profitable
    form, so the lockstep program stays on the einsum chain regardless
    of --dense_trunk (2026-08-21 A/B record: Config.resolved_dense_trunk)."""
    if model.dense_trunk == "fused":
        model = dataclasses.replace(model, dense_trunk="xla")
    return model


def make_dense_vmap_run(
    model: DGCNN, optimizer: optax.GradientTransformation
) -> Callable:
    """Fold-lockstep runner on the single-tile dense layout: per-fold
    loss/grads vmapped over the fold axis. NOTE the asymmetry with the
    block/multi runners: at small dense tiles the per-index gather
    payload is large (a whole [n_tile, n_tile] adjacency row block), so
    fold-vmapped gathers are bandwidth-bound and FINE here — a flat
    [F·slots] single-gather rewrite measured 88.8 vs 54.3 ms per NCI1
    train-only lockstep epoch (2026-08-20 on-chip A/B) and was
    reverted."""
    model = _force_xla_trunk(model)

    def fold_train_loss(params, data, idx_row, dropout_key):
        batch = gather_dense_batch(data, idx_row)
        lp = apply(
            params, model, batch, deterministic=False, dropout_rng=dropout_key
        )
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    grad_fold = jax.value_and_grad(fold_train_loss, has_aux=True)

    def fold_eval_loss(params, data, idx_row):
        batch = gather_dense_batch(data, idx_row)
        lp = apply(params, model, batch, deterministic=True)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    def grads_all(params_f, data, idx_rows, drop_f):
        return jax.vmap(grad_fold, in_axes=(0, None, 0, 0))(
            params_f, data, idx_rows, drop_f
        )

    def eval_all(params_f, data, idx_rows):
        return jax.vmap(fold_eval_loss, in_axes=(0, None, 0))(
            params_f, data, idx_rows
        )

    return jax.jit(_make_lockstep_body(optimizer, grads_all, eval_all))


def make_block_vmap_run(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    nb_budget: int,
    w_budget: int,
    mesh=None,
) -> Callable:
    """Fold-lockstep runner on the block-sparse layout (VERDICT r3 #1):
    every fold's batch assembles against the SHARED device-resident block
    pool and the GCN aggregation of all folds runs as ONE merged f-major
    item stream (models/dgcnn.py block_propagate_folds) — sequential-size
    (VMEM-fusible) chunk iterations, trip count ∝ the folds' total real
    items. `w_budget` sizes the merged per-device stream
    (block_sparse.block_fold_extents). Math per fold is identical to
    BlockSparseEngine's (tests/test_cv_vmap.py block rows).

    With `mesh`, the whole runner wraps in shard_map over the mesh "data"
    axis: each device runs its contiguous group of folds with its own
    merged stream — zero collectives (the pod recipe's fold half)."""
    from dgcnn_tpu.batching.block_sparse import gather_block_batch_folds
    from dgcnn_tpu.models.dgcnn import apply_block_folds

    def grads_all(params_f, dev, idx_rows, drop_f):
        fb = gather_block_batch_folds(dev, idx_rows, nb_budget, w_budget)

        def loss(p_f):
            lp_f = apply_block_folds(
                p_f, model, fb, dev.pool, deterministic=False,
                dropout_rng_f=drop_f,
            )
            loss_f, corr_f = jax.vmap(nll_loss_and_correct)(
                lp_f, fb.y, fb.graph_mask
            )
            # folds are independent: grads of the sum ARE per-fold grads
            return loss_f.sum(), (loss_f, corr_f)

        (_, aux), grads_f = jax.value_and_grad(loss, has_aux=True)(params_f)
        return aux, grads_f

    def eval_all(params_f, dev, idx_rows):
        fb = gather_block_batch_folds(dev, idx_rows, nb_budget, w_budget)
        lp_f = apply_block_folds(params_f, model, fb, dev.pool)
        return jax.vmap(nll_loss_and_correct)(lp_f, fb.y, fb.graph_mask)

    run = _make_lockstep_body(optimizer, grads_all, eval_all)
    if mesh is None:
        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    state = (P("data"), P("data"), P("data"))
    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=state + (P(), P(None, None, "data"), P(None, "data")),
            out_specs=state + (P(None, "data"),),
            check_vma=False,
        )
    )


def make_multi_vmap_run(
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    mesh=None,
) -> Callable:
    """Fold-lockstep runner on the size-bucketed multi-tile dense layout
    (the COLLAB default): per-class batches gather on FLAT [F·S_c] slot
    axes (models/dgcnn.py apply_multi_dense_folds) — the multi step is
    ~95% fixed per-op overhead at COLLAB scale, so fold-batching it is
    near-free throughput. Orders arrive as a TUPLE of per-class
    [.., steps, F, S_c] tensors."""
    from dgcnn_tpu.batching.dense import gather_dense_batch
    from dgcnn_tpu.models.dgcnn import apply_multi_dense_folds

    def batches_of(classes, idx_rows_t):
        F = jtu.tree_leaves(idx_rows_t)[0].shape[0]
        return tuple(
            gather_dense_batch(d, r.reshape(-1))
            for d, r in zip(classes, idx_rows_t)
        ), F

    def grads_all(params_f, classes, idx_rows_t, drop_f):
        bs, F = batches_of(classes, idx_rows_t)

        def loss(p_f):
            lp, y, gm = apply_multi_dense_folds(
                p_f, model, bs, F, deterministic=False, dropout_rng_f=drop_f
            )
            loss_f, corr_f = jax.vmap(nll_loss_and_correct)(lp, y, gm)
            return loss_f.sum(), (loss_f, corr_f)

        (_, aux), grads_f = jax.value_and_grad(loss, has_aux=True)(params_f)
        return aux, grads_f

    def eval_all(params_f, classes, idx_rows_t):
        bs, F = batches_of(classes, idx_rows_t)
        lp, y, gm = apply_multi_dense_folds(params_f, model, bs, F)
        return jax.vmap(nll_loss_and_correct)(lp, y, gm)

    run = _make_lockstep_body(optimizer, grads_all, eval_all)
    if mesh is None:
        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    state = (P("data"), P("data"), P("data"))
    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=state + (P(), P(None, None, "data"), P(None, "data")),
            out_specs=state + (P(None, "data"),),
            check_vma=False,
        )
    )


def fold_shard_devices(mesh_shape, num_folds: int):
    """Mesh data-axis size usable for fold-sharded lockstep, or None.

    Fold-lockstep puts the K independent fold trainings on a leading
    vmap axis; sharding that axis over the mesh "data" axis runs K folds
    concurrently on the mesh with no collectives (the pod recipe half
    SCALING.md names). Requires a (D, 1) mesh; returns 1 for a
    single-chip run (plain lockstep). When D does not divide K (the
    reference's 10 folds on the common 4- and 8-chip hosts,
    reference train.py:93), the runner pads the fold axis with fully
    masked folds up to the next multiple of D — an all-(−1)-step fold
    contributes zero loss/grads and its optimizer state stays frozen
    (`_make_lockstep_body` masking), so padding changes no real fold's
    math (round-5 item: VERDICT r4 #2)."""
    d, g = mesh_shape
    if g != 1 or d < 1:
        return None
    return max(d, 1)


def _stacked_orders(
    train_idx_f: List[np.ndarray],
    perms_f: List[np.ndarray],
    batch_size: int,
    slots: int,
    steps_max: int,
) -> np.ndarray:
    """[steps_max, F, slots] — each fold's shuffled epoch order matrix,
    −1-row padded up to the lockstep step count."""
    mats = []
    for idx, perm in zip(train_idx_f, perms_f):
        m = order_matrix(idx[perm], batch_size, slots)
        if len(m) < steps_max:
            m = np.concatenate(
                [m, np.full((steps_max - len(m), slots), -1, np.int32)]
            )
        mats.append(m)
    return np.stack(mats, axis=1)


def run_cv_folds_vmap(
    cfg: Config,
    dataset: GraphSet,
    model: DGCNN,
    optimizer: optax.GradientTransformation,
    folds: List[Tuple[np.ndarray, np.ndarray]],
    events: EventLog,
    layout: str = "dense",
) -> Tuple[List[float], List[float]]:
    """Run the whole K-fold experiment in fold-lockstep on the dense,
    block-sparse or multi-tile layout, optionally fold-SHARDED over a
    (D, 1) mesh (fold_shard_devices). Returns (train_accs, test_accs)
    and writes the sequential driver's artifact set."""
    F_real = len(folds)
    slots = ((cfg.batch_size + cfg.graph_pad_multiple - 1)
             // cfg.graph_pad_multiple) * cfg.graph_pad_multiple

    n_shard = fold_shard_devices(cfg.mesh_shape, F_real) or 1
    # D ∤ K: pad the fold axis with fully masked folds (every step row
    # all-(−1) → zero loss/grads, frozen Adam state, no PRNG consumption,
    # no artifacts) so 10 folds shard over 4- or 8-device meshes
    F = -(-F_real // n_shard) * n_shard
    if F > F_real:
        empty = np.zeros(0, np.int32)
        folds = list(folds) + [(empty, empty)] * (F - F_real)
        print(
            f"[dgcnn_tpu] fold axis padded {F_real} → {F} "
            f"(masked folds) for {n_shard}-way fold sharding"
        )
    mesh = state_shard = order4d_shard = order3d_shard = data_shard = None
    if n_shard > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dgcnn_tpu.parallel import make_mesh

        mesh = make_mesh(cfg.mesh_shape)
        state_shard = NamedSharding(mesh, P("data"))
        order4d_shard = NamedSharding(mesh, P(None, None, "data"))
        order3d_shard = NamedSharding(mesh, P(None, "data"))
        data_shard = NamedSharding(mesh, P())

    def put_data(tree):
        return jax.device_put(tree, data_shard) if data_shard else (
            jax.device_put(tree)
        )

    train_idx_f = [np.asarray(tr, np.int32) for tr, _ in folds]
    test_idx_f = [np.asarray(te, np.int32) for _, te in folds]
    n_train_f = np.array([len(t) for t in train_idx_f])
    n_test_f = np.array([len(t) for t in test_idx_f])
    steps_max = int(max(-(-n // cfg.batch_size) for n in n_train_f))
    t_steps_max = int(max(-(-n // cfg.batch_size) for n in n_test_f))
    shuffles = [
        np.random.default_rng(np.random.SeedSequence([cfg.seed, f]))
        for f in range(1, F + 1)
    ]

    def _stacked_test_orders() -> np.ndarray:
        test_mats = []
        for te in test_idx_f:
            m = order_matrix(te, cfg.batch_size, slots)
            if len(m) < t_steps_max:
                m = np.concatenate(
                    [m, np.full((t_steps_max - len(m), slots), -1, np.int32)]
                )
            test_mats.append(m)
        return np.stack(test_mats, axis=1)

    def _epoch_perms():
        return [rng.permutation(n) for rng, n in zip(shuffles, n_train_f)]

    # Each layout provides:
    #   build_chunk(k) → (order4d pytree with leaves [k, steps, F, ·],
    #                     test orders pytree with leaves [t_steps, F, ·],
    #                     run signature)  — consuming k epochs' shuffles
    #   run_for(signature) → the jitted runner for those budgets
    if layout == "block":
        from dgcnn_tpu.batching.block_sparse import (
            block_fold_extents,
            build_block_graphset,
        )

        bdev = build_block_graphset(dataset)
        nb_host = bdev.nb.astype(np.int64)
        bc_host = bdev.block_count.astype(np.int64)
        pool_dt = (
            cfg.compute_dtype if cfg.compute_dtype != "float32"
            else cfg.resolved_adj_dtype()
        )
        if pool_dt != "float32":
            bdev = dataclasses.replace(
                bdev, pool=bdev.pool.astype(jnp.dtype(pool_dt))
            )
        data = put_data(bdev)
        if cfg.block_impl == "pallas":
            # the fused CSR kernel is per-batch; the lockstep program runs
            # the semantically identical merged XLA formulation
            print(
                "[dgcnn_tpu] note: fold-lockstep runs the merged XLA "
                "block formulation (block_impl=pallas is per-batch)"
            )
        runs: dict = {}
        budget_floor = [8, 64]

        def geom_round(x, multiple, ratio=1.3):
            # grow-only geometric budget grid (same policy as
            # cv.py DeviceCooEngine._geom_round: bounded padding waste,
            # logarithmically many compiled programs)
            v = multiple
            while v < x:
                v = ((int(v * ratio) + multiple) // multiple) * multiple
            return v

        def budget_for(*order_mats):
            nb = w = 1
            for m in order_mats:
                bn, bw = block_fold_extents(nb_host, bc_host, m, n_shard)
                nb, w = max(nb, bn), max(w, bw)
            budget_floor[0] = max(budget_floor[0], geom_round(nb, 8))
            budget_floor[1] = max(budget_floor[1], geom_round(w, 64))
            return tuple(budget_floor)

        test_order_np = _stacked_test_orders()

        def build_chunk(k):
            order4d = np.stack([
                _stacked_orders(train_idx_f, _epoch_perms(),
                                cfg.batch_size, slots, steps_max)
                for _ in range(k)
            ])
            return order4d, test_order_np, budget_for(order4d, test_order_np)

        def run_for(budget):
            if budget not in runs:
                runs[budget] = make_block_vmap_run(
                    model, optimizer, *budget, mesh=mesh
                )
            return runs[budget]
    elif layout == "multi":
        from dgcnn_tpu.batching.multi_dense import (
            build_multi_dense_on_device,
            class_batch_counts,
            plan_tiles,
            route_order_rows,
        )

        tiles = plan_tiles(dataset.node_counts(), cfg.multi_dense_min_tile)
        classes, routing = build_multi_dense_on_device(
            dataset, tiles, adj_dtype=cfg.resolved_adj_dtype()
        )
        if cfg.compute_dtype != "float32":
            dt = jnp.dtype(cfg.compute_dtype)
            classes = jtu.tree_map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                classes,
            )
        data = put_data(classes)
        # grow-only per-class slot floors, pre-warmed over sampled
        # shuffles and capped — same policy as cv.py MultiDenseEngine
        slot_floor = np.full(len(tiles), 4, dtype=np.int64)

        def slots_for(*ids_seqs):
            nonlocal slot_floor
            need = slot_floor
            for ids in ids_seqs:
                if len(ids) == 0:  # padded masked fold (D ∤ K sharding)
                    continue
                counts = class_batch_counts(routing, ids, cfg.batch_size)
                need = np.maximum(need, counts.max(axis=0))
            slot_floor = -(-need // 4) * 4
            return tuple(int(s) for s in slot_floor)

        warm_rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 0]))
        slots_for(
            *(warm_rng.permutation(dataset.num_graphs) for _ in range(40))
        )
        cap = -(-cfg.batch_size // 4) * 4
        slot_floor = np.minimum(slot_floor, cap)

        def _fold_orders(ids, cslots, n_steps):
            # one fold's epoch → per class [n_steps, S_c], −1 step-padded
            bs = cfg.batch_size
            rows = [
                route_order_rows(routing, ids[i : i + bs], cslots)
                for i in range(0, len(ids), bs)
            ]
            out = []
            for c, s_c in enumerate(cslots):
                m = np.stack([r[c] for r in rows]) if rows else \
                    np.zeros((0, s_c), np.int32)
                if len(m) < n_steps:
                    m = np.concatenate(
                        [m, np.full((n_steps - len(m), s_c), -1, np.int32)]
                    )
                out.append(m)
            return out

        def build_chunk(k):
            ids_k = [
                [train_idx_f[f][p] for f, p in enumerate(_epoch_perms())]
                for _ in range(k)
            ]
            cslots = slots_for(
                *(ids for epoch_ids in ids_k for ids in epoch_ids),
                *test_idx_f,
            )
            per_epoch = []
            for epoch_ids in ids_k:
                per_fold = [
                    _fold_orders(ids, cslots, steps_max) for ids in epoch_ids
                ]
                per_epoch.append(tuple(
                    np.stack([pf[c] for pf in per_fold], axis=1)
                    for c in range(len(cslots))
                ))
            order4d = tuple(
                np.stack([pe[c] for pe in per_epoch])
                for c in range(len(cslots))
            )
            test_pf = [
                _fold_orders(te, cslots, t_steps_max) for te in test_idx_f
            ]
            test_np = tuple(
                np.stack([pf[c] for pf in test_pf], axis=1)
                for c in range(len(cslots))
            )
            return order4d, test_np, cslots

        multi_run = make_multi_vmap_run(model, optimizer, mesh=mesh)
        run_for = lambda sig: multi_run  # shapes flow from the arrays
    elif layout == "dense":
        n_tile = dense_tile(dataset)
        data = build_dense_dataset_on_device(
            dataset, n_tile, adj_dtype=cfg.resolved_adj_dtype()
        )
        if cfg.compute_dtype != "float32":
            dt = jnp.dtype(cfg.compute_dtype)
            data = jtu.tree_map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, data
            )
        if data_shard is not None:
            data = jax.device_put(data, data_shard)
        dense_run = make_dense_vmap_run(model, optimizer)
        test_order_np = _stacked_test_orders()

        def build_chunk(k):
            order4d = np.stack([
                _stacked_orders(train_idx_f, _epoch_perms(),
                                cfg.batch_size, slots, steps_max)
                for _ in range(k)
            ])
            return order4d, test_order_np, ()

        run_for = lambda sig: dense_run
    else:
        raise ValueError(
            f"fold-lockstep supports dense/block/multi, not {layout!r}"
        )

    # per-fold RNG: identical streams to the sequential driver (cv.py
    # run_fold) — fold f's init/dropout and shuffles reproduce exactly.
    # One jitted program for key derivation + init + optimizer state
    # (three separate compiles cost tens of seconds on this transport).
    @jax.jit
    def _init_all(seed):
        def one(f):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), f)
            init_key, run_key = jax.random.split(key)
            p = init_params(init_key, model)
            return p, optimizer.init(p), run_key

        return jax.vmap(one)(jnp.arange(1, F + 1))

    params_f, opt_f, rng_f = _init_all(cfg.seed)
    if state_shard is not None:
        params_f, opt_f, rng_f = jax.device_put(
            (params_f, opt_f, rng_f), state_shard
        )
        print(
            f"[dgcnn_tpu] fold-sharded lockstep: {F} folds over "
            f"{n_shard} mesh devices ({layout} layout)"
        )
    metrics_f = [FoldMetrics() for _ in range(F_real)]
    train_edges_f = [
        int(dataset.edge_counts()[np.asarray(tr)].sum()) for tr in train_idx_f
    ]

    # checkpoint/resume: ONE stacked bundle for the whole lockstep run
    # (folds advance together, so per-fold inflight files would be
    # redundant); same atomic format and shuffle-stream replay as the
    # sequential driver's per-fold inflight (cv.py run_fold)
    inflight = os.path.join(
        cfg.epochs_dir, f"{cfg.data_type}_lockstep_inflight"
    )

    def _bundle():
        host_p, host_o = jax.device_get((params_f, opt_f))
        return {
            "params_f": host_p,
            "opt_f": host_o,
            "rng_f": np.asarray(rng_f),
            "epoch": np.int64(epoch - 1),
            "metrics": {
                c: np.stack([np.asarray(m.rows[c]) for m in metrics_f])
                for c in FoldMetrics.COLUMNS
            },
        }

    epoch = 1
    if cfg.checkpoint_resume and checkpoint_exists(inflight):
        like = {
            "params_f": jax.device_get(params_f),
            "opt_f": jax.device_get(opt_f),
            "rng_f": np.asarray(rng_f),
            "epoch": np.int64(0),
            "metrics": {
                c: np.zeros((F_real, 0)) for c in FoldMetrics.COLUMNS
            },
        }
        bundle = load_checkpoint(inflight, like)
        params_f = jax.device_put(bundle["params_f"], state_shard)
        opt_f = jax.device_put(bundle["opt_f"], state_shard)
        rng_f = jax.device_put(
            np.asarray(bundle["rng_f"]), state_shard
        ) if state_shard is not None else jnp.asarray(bundle["rng_f"])
        epoch = int(bundle["epoch"]) + 1
        if epoch > cfg.num_epochs:
            raise ValueError(
                f"--resume checkpoint {inflight!r} is at epoch "
                f"{epoch - 1}, beyond --num_epochs={cfg.num_epochs}: "
                "refusing to publish a shorter-protocol result. Rerun "
                "with the original --num_epochs or delete the inflight "
                "checkpoint."
            )
        for f in range(F_real):
            metrics_f[f].rows = {
                c: list(map(float, bundle["metrics"][c][f]))
                for c in FoldMetrics.COLUMNS
            }
        # replay each fold's shuffle stream so epoch k sees the same
        # permutation it would have in an uninterrupted run
        for rng, n in zip(shuffles, n_train_f):
            for _ in range(epoch - 1):
                rng.permutation(n)
        print(f"[all folds] resumed at epoch {epoch} (lockstep)")

    while epoch <= cfg.num_epochs:
        k = cfg.num_epochs - epoch + 1
        if cfg.max_fused_epochs:
            k = min(k, cfg.max_fused_epochs)
        if cfg.checkpoint_every:
            k = min(
                k,
                cfg.checkpoint_every - (epoch - 1) % cfg.checkpoint_every,
            )
        order4d_np, test_np, runsig = build_chunk(k)
        t0 = time.perf_counter()
        run = run_for(runsig)
        params_f, opt_f, rng_f, rows = run(
            params_f, opt_f, rng_f, data,
            jax.device_put(order4d_np, order4d_shard),
            jax.device_put(test_np, order3d_shard),
        )
        rows = np.asarray(jax.device_get(rows), dtype=np.float64)  # [k, F, 4]
        dt = (time.perf_counter() - t0) / k

        for j in range(k):
            for f in range(F_real):
                tr_loss, te_loss, tr_c, te_c = rows[j, f]
                train_acc = tr_c / n_train_f[f] * 100.0
                test_acc = te_c / n_test_f[f] * 100.0
                metrics_f[f].append(float(tr_loss), float(te_loss),
                                    train_acc, test_acc)
                events.write(
                    kind="epoch",
                    fold=f + 1,
                    epoch=epoch + j,
                    train_loss=float(tr_loss),
                    test_loss=float(te_loss),
                    train_accuracy=train_acc,
                    test_accuracy=test_acc,
                    # lockstep: dt covers all F folds' epochs at once
                    epoch_seconds=dt,
                    edges_per_second=(
                        sum(train_edges_f) / dt if dt > 0 else 0.0
                    ),
                    chunk_epochs=k,
                    folds_in_lockstep=F_real,
                )
            if cfg.log_every and (epoch + j) % cfg.log_every == 0:
                accs = " ".join(
                    f"{rows[j, f, 3] / n_test_f[f] * 100.0:.1f}" for f in range(F_real)
                )
                print(f"[all folds] epoch {epoch + j}: test% [{accs}] ({dt:.2f}s)")
        epoch += k
        if cfg.checkpoint_every and (epoch - 1) % cfg.checkpoint_every == 0:
            save_checkpoint(inflight, _bundle())

    # per-fold artifacts, identical to the sequential driver. ONE device
    # fetch for the whole stacked state — per-leaf-per-fold slicing costs
    # hundreds of tiny D2H round-trips on this transport.
    host_params, host_opt = jax.device_get((params_f, opt_f))
    train_accs, test_accs = [], []
    for f in range(F_real):
        fold_params = jtu.tree_map(lambda a: a[f], host_params)
        fold_opt = jtu.tree_map(lambda a: a[f], host_opt)
        save_checkpoint(
            os.path.join(cfg.epochs_dir, f"{cfg.data_type}_{f + 1}"),
            {"params": fold_params, "opt_state": fold_opt},
        )
        metrics_f[f].to_csv(
            os.path.join(
                cfg.statistics_dir, f"{cfg.data_type}_results_{f + 1}.csv"
            )
        )
        train_accs.append(metrics_f[f].last("train_accuracy"))
        test_accs.append(metrics_f[f].last("test_accuracy"))
        print(
            f"[{f + 1}] Train Acc: {train_accs[-1]:.2f}% "
            f"Test Acc: {test_accs[-1]:.2f}%"
        )
    for suffix in (".npz", ".treedef.json"):
        try:
            os.remove(inflight + suffix)
        except OSError:
            pass
    return train_accs, test_accs
