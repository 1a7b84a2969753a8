#!/usr/bin/env python
"""Op-level trace of ONE dense fold-lockstep training step (NCI1).

The production program fuses whole epoch ranges into one XLA while
loop, which device traces report as a single opaque event — so this
probe jits the UNFUSED lockstep step (the exact grads_all + masked
Adam update of train/cv_vmap.make_dense_vmap_run, minus the scan) and
runs it repeatedly under jax.profiler so every op shows up for
tools/summarize_trace.py.

    python tools/probe_lockstep_trace.py --data_type NCI1 \
        --logdir /tmp/prof_lockstep
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="NCI1")
    p.add_argument("--logdir", default="/tmp/prof_lockstep")
    p.add_argument("--calls", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgcnn_tpu.batching.dense import (
        build_dense_dataset_on_device,
        dense_tile,
        gather_dense_batch,
        order_matrix,
    )
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.data.folds import get_folds
    from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
    from dgcnn_tpu.train.loop import nll_loss_and_correct
    from dgcnn_tpu.utils.profiling import trace

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    folds = get_folds(gs.y, "", 10, 324, data_type=args.data_type)
    F = len(folds)
    model = DGCNN(num_features=gs.num_features,
                  num_classes=gs.num_classes)
    optimizer = optax.adam(1e-3)
    data = build_dense_dataset_on_device(
        gs, dense_tile(gs), adj_dtype="bfloat16"
    )
    slots = 56

    def fold_train_loss(params, data, idx_row, dropout_key):
        batch = gather_dense_batch(data, idx_row)
        lp = apply(params, model, batch, deterministic=False,
                   dropout_rng=dropout_key)
        return nll_loss_and_correct(lp, batch.y, batch.graph_mask)

    grad_fold = jax.value_and_grad(fold_train_loss, has_aux=True)

    @jax.jit
    def step(params_f, opt_f, keys, idx_rows):
        (loss, _), grads = jax.vmap(
            grad_fold, in_axes=(0, None, 0, 0)
        )(params_f, data, idx_rows, keys)

        def upd(g, s, p):
            u, ns = optimizer.update(g, s, p)
            return optax.apply_updates(p, u), ns

        params_f, opt_f = jax.vmap(upd)(grads, opt_f, params_f)
        return params_f, opt_f, loss.sum()

    def one(f):
        key = jax.random.fold_in(jax.random.PRNGKey(324), f)
        ik, rk = jax.random.split(key)
        return init_params(ik, model), optimizer.init(
            init_params(ik, model)
        ), rk

    params_f, opt_f, rng_f = jax.jit(
        lambda: jax.vmap(one)(jnp.arange(1, F + 1))
    )()
    rng = np.random.default_rng(7)
    rows = np.stack([
        order_matrix(
            rng.permutation(np.asarray(tr, np.int32)), 50, slots
        )[0]
        for tr, _ in folds
    ])  # [F, slots]
    keys = jax.random.split(jax.random.PRNGKey(0), F)
    idx = jax.device_put(rows)

    params_f, opt_f, l = step(params_f, opt_f, keys, idx)  # compile
    float(l)
    with trace(args.logdir):
        for _ in range(args.calls):
            params_f, opt_f, l = step(params_f, opt_f, keys, idx)
        float(l)
    print("traced", args.calls, "steps ->", args.logdir)


if __name__ == "__main__":
    main()
