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


def make_dense_vmap_run(model: DGCNN, optimizer: optax.GradientTransformation) -> Callable:
    """Fused multi-epoch runner over a fold axis F.

        run(params_f, opt_f, rng_f, data, order4d, test_order3d)
            → (params_f, opt_f, rng_f, rows)

    params_f/opt_f/rng_f: pytrees with leading fold axis F (per-fold
    optimizer state, so masked folds keep their own Adam counts);
    order4d: [k, steps, F, slots] (−1-padded; an all-(−1) row is a
    skipped step for that fold); test_order3d: [t_steps, F, slots];
    rows: [k, F, 4] = (train_loss, test_loss, train_correct,
    test_correct) per epoch per fold."""

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

    @jax.jit
    def run(params_f, opt_f, rng_f, data, order4d, test_order3d):
        def step(carry, idx_rows):  # idx_rows [F, slots]
            params_f, opt_f, rng_f = carry
            keys = jax.vmap(jax.random.split)(rng_f)  # [F, 2, key]
            real = (idx_rows >= 0).any(axis=1)  # [F]
            # folds skipping this step must NOT consume a PRNG split —
            # the sequential driver splits once per REAL step, and the
            # per-fold dropout streams must match it exactly
            rng_f = jnp.where(real[:, None], keys[:, 0], rng_f)
            drop_f = keys[:, 1]
            (loss_f, corr_f), grads_f = jax.vmap(
                grad_fold, in_axes=(0, None, 0, 0)
            )(params_f, data, idx_rows, drop_f)
            params_f, opt_f = jax.vmap(masked_update)(
                real, grads_f, opt_f, params_f
            )
            rf = real.astype(jnp.float32)
            return (params_f, opt_f, rng_f), (loss_f * rf, corr_f * rf, rf)

        def epoch(carry, order3d):  # order3d [steps, F, slots]
            carry, (losses, corrects, reals) = jax.lax.scan(step, carry, order3d)
            params_f = carry[0]

            def eval_body(c, idx_rows):
                loss_f, corr_f = jax.vmap(fold_eval_loss, in_axes=(0, None, 0))(
                    params_f, data, idx_rows
                )
                rf = (idx_rows >= 0).any(axis=1).astype(jnp.float32)
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
) -> Tuple[List[float], List[float]]:
    """Run the whole K-fold experiment in fold-lockstep on the dense
    layout. Returns (train_accs, test_accs) and writes the sequential
    driver's artifact set."""
    F = len(folds)
    n_tile = dense_tile(dataset)
    slots = ((cfg.batch_size + cfg.graph_pad_multiple - 1)
             // cfg.graph_pad_multiple) * cfg.graph_pad_multiple
    data = build_dense_dataset_on_device(
        dataset, n_tile, adj_dtype=cfg.resolved_adj_dtype()
    )
    if cfg.compute_dtype != "float32":
        dt = jnp.dtype(cfg.compute_dtype)
        data = jtu.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, data
        )

    train_idx_f = [np.asarray(tr, np.int32) for tr, _ in folds]
    test_idx_f = [np.asarray(te, np.int32) for _, te in folds]
    n_train_f = np.array([len(t) for t in train_idx_f])
    n_test_f = np.array([len(t) for t in test_idx_f])
    steps_max = int(max(-(-n // cfg.batch_size) for n in n_train_f))
    t_steps_max = int(max(-(-n // cfg.batch_size) for n in n_test_f))

    test_mats = []
    for te in test_idx_f:
        m = order_matrix(te, cfg.batch_size, slots)
        if len(m) < t_steps_max:
            m = np.concatenate(
                [m, np.full((t_steps_max - len(m), slots), -1, np.int32)]
            )
        test_mats.append(m)
    test_order3d = jax.device_put(np.stack(test_mats, axis=1))

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
    shuffles = [
        np.random.default_rng(np.random.SeedSequence([cfg.seed, f]))
        for f in range(1, F + 1)
    ]

    run = make_dense_vmap_run(model, optimizer)
    metrics_f = [FoldMetrics() for _ in range(F)]
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
                c: np.zeros((F, 0)) for c in FoldMetrics.COLUMNS
            },
        }
        bundle = load_checkpoint(inflight, like)
        params_f = jax.device_put(bundle["params_f"])
        opt_f = jax.device_put(bundle["opt_f"])
        rng_f = jnp.asarray(bundle["rng_f"])
        epoch = int(bundle["epoch"]) + 1
        if epoch > cfg.num_epochs:
            raise ValueError(
                f"--resume checkpoint {inflight!r} is at epoch "
                f"{epoch - 1}, beyond --num_epochs={cfg.num_epochs}: "
                "refusing to publish a shorter-protocol result. Rerun "
                "with the original --num_epochs or delete the inflight "
                "checkpoint."
            )
        for f in range(F):
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
        order4d = np.stack(
            [
                _stacked_orders(
                    train_idx_f,
                    [rng.permutation(n) for rng, n in zip(shuffles, n_train_f)],
                    cfg.batch_size,
                    slots,
                    steps_max,
                )
                for _ in range(k)
            ]
        )
        t0 = time.perf_counter()
        params_f, opt_f, rng_f, rows = run(
            params_f, opt_f, rng_f, data, jax.device_put(order4d), test_order3d
        )
        rows = np.asarray(jax.device_get(rows), dtype=np.float64)  # [k, F, 4]
        dt = (time.perf_counter() - t0) / k

        for j in range(k):
            for f in range(F):
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
                    folds_in_lockstep=F,
                )
            if cfg.log_every and (epoch + j) % cfg.log_every == 0:
                accs = " ".join(
                    f"{rows[j, f, 3] / n_test_f[f] * 100.0:.1f}" for f in range(F)
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
    for f in range(F):
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
