#!/usr/bin/env python
"""Ablation anatomy of the dense-engine training step (on-chip).

The dense fused runner executes `steps` scan iterations per epoch; this
tool times stripped-down variants of that step — each as ONE fused scan
dispatch (the transport adds ~25-30 ms per dispatch, so per-step numbers
only mean anything when many steps amortize one dispatch) — and prints a
cost breakdown:

    empty        scan body with a trivial carry (dispatch + scan floor)
    gather       per-step dense-batch gather only (adjacency HBM copy)
    gcn_fwd      4 GCN propagations on a pre-gathered batch (MXU fwd)
    gcn_grad     value_and_grad of gcn_fwd (fwd + bwd matmuls)
    fwd          full model forward + loss (gather + GCN + sortpool + head)
    grad         full value_and_grad (no optimizer)
    sgd          full step with SGD (isolates Adam vs plain apply)
    full         the real train step (gather + fwd/bwd + Adam), the same
                 program shape DenseEngine dispatches

Differences between rows locate the time: e.g. `full − sgd` ≈ Adam,
`grad − gcn_grad − gather` ≈ sortpool/readout/loss fwd+bwd,
`full` × steps ≈ the engine's epoch time (sans eval).

Usage:  python tools/profile_step.py --data_type NCI1 [--steps N] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, make_args, steps, reps):
    """min over reps of one fused dispatch, per step (seconds). Inputs are
    varied per rep (the transport caches identical dispatches) and each rep
    is fenced by a D2H value fetch."""
    float(fn(*make_args(0)))  # compile + warm
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        float(fn(*make_args(r)))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="NCI1")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--force_cpu", action="store_true",
                   help="run on host CPU (mechanics check; the env's "
                        "sitecustomize pins the axon TPU platform, so an "
                        "env var alone cannot)")
    args = p.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from dgcnn_tpu.batching.dense import (
        build_dense_dataset_on_device,
        dense_tile,
        gather_dense_batch,
        order_matrix,
    )
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
    from dgcnn_tpu.train.loop import (
        make_dense_gather_run,
        nll_loss_and_correct,
    )

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)])
    n_tile = dense_tile(train)
    slots = -(-args.batch_size // 8) * 8
    model = DGCNN(num_features=train.num_features, num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)
    data = build_dense_dataset_on_device(train, n_tile)

    sh = np.random.default_rng(7)

    def orders(steps):
        """[steps, slots] rows cycling fresh shuffles of the train set."""
        rows = []
        while len(rows) * args.batch_size < steps * args.batch_size:
            m = order_matrix(sh.permutation(train.num_graphs), args.batch_size,
                            slots)
            rows.extend(m)
            if len(rows) >= steps:
                break
        return np.stack(rows[:steps])

    order_pool = [jax.device_put(orders(args.steps)) for _ in range(args.reps + 1)]
    S = args.steps
    report = {}

    # -- empty: dispatch + scan floor -------------------------------------
    @jax.jit
    def empty(seed):
        def body(c, i):
            return c + i, ()
        c, _ = jax.lax.scan(body, seed, jnp.arange(S, dtype=jnp.float32))
        return c

    report["empty"] = _timed(empty, lambda r: (jnp.float32(r),), S, args.reps)

    # NOTE on jit boundaries: the device-resident dataset (and any fixed
    # batch) is always an EXPLICIT jit argument below — closing over it
    # inlines the arrays as HLO constants, and this transport's
    # remote_compile endpoint rejects large request bodies (HTTP 413).

    # -- gather: per-step dense batch assembly ----------------------------
    @jax.jit
    def gather(d, order2d, seed):
        def body(c, idx_row):
            b = gather_dense_batch(d, idx_row)
            # consume every gathered byte (a [0,0,0] probe would let XLA
            # shrink the gather itself)
            return c + b.adj.sum() + b.x.sum() + seed, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), order2d)
        return c

    report["gather"] = _timed(
        gather, lambda r: (data, order_pool[r], jnp.float32(r)), S, args.reps
    )

    # -- gcn core on a fixed pre-gathered batch ---------------------------
    fixed = jax.block_until_ready(
        jax.jit(gather_dense_batch)(data, order_pool[0][0])
    )
    Ws = [params["gcn"][i]["w"] for i in range(4)]

    def gcn_fwd_loss(ws, adj, x, seed):
        h = x + seed
        for w in ws:
            h = jnp.tanh(adj @ (h @ w[: h.shape[-1]]))
        return jnp.sum(h)

    @jax.jit
    def gcn_fwd(ws, adj, x, seed):
        def body(c, _):
            return c + gcn_fwd_loss(ws, adj, x, c * 1e-9 + seed), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["gcn_fwd"] = _timed(
        gcn_fwd, lambda r: (Ws, fixed.adj, fixed.x, jnp.float32(r)),
        S, args.reps,
    )

    @jax.jit
    def gcn_grad(ws, adj, x, seed):
        def body(c, _):
            v, g = jax.value_and_grad(gcn_fwd_loss)(ws, adj, x, c * 1e-9 + seed)
            return c + v + g[0][0, 0], ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["gcn_grad"] = _timed(
        gcn_grad, lambda r: (Ws, fixed.adj, fixed.x, jnp.float32(r)),
        S, args.reps,
    )

    # -- full forward / grad (no optimizer) -------------------------------
    def step_loss(p, d, idx_row, key):
        batch = gather_dense_batch(d, idx_row)
        lp = apply(p, model, batch, deterministic=False, dropout_rng=key)
        loss, _ = nll_loss_and_correct(lp, batch.y, batch.graph_mask)
        return loss

    @jax.jit
    def fwd(p, d, order2d, key):
        def body(c, idx_row):
            k, key = jax.random.split(c[1])
            return (c[0] + step_loss(p, d, idx_row, k), key), ()
        c, _ = jax.lax.scan(body, (jnp.float32(0), key), order2d)
        return c[0]

    report["fwd"] = _timed(
        fwd, lambda r: (params, data, order_pool[r], jax.random.PRNGKey(r)),
        S, args.reps,
    )

    @jax.jit
    def grad(p, d, order2d, key):
        def body(c, idx_row):
            k, key = jax.random.split(c[1])
            v, g = jax.value_and_grad(step_loss)(p, d, idx_row, k)
            return (c[0] + v + g["gcn"][0]["w"][0, 0], key), ()
        c, _ = jax.lax.scan(body, (jnp.float32(0), key), order2d)
        return c[0]

    report["grad"] = _timed(
        grad, lambda r: (params, data, order_pool[r], jax.random.PRNGKey(r)),
        S, args.reps,
    )

    # -- full train step under SGD and Adam (the real engine program) -----
    from dgcnn_tpu.train.flat_opt import flatten_optimizer

    for name, opt in (
        ("sgd", optax.sgd(1e-3)),
        ("full", optax.adam(1e-3)),
        # Adam on ONE raveled vector (Config.opt_flatten): full − full_flat
        # is the per-leaf kernel-launch overhead of the update
        ("full_flat", flatten_optimizer(optax.adam(1e-3))),
    ):
        run = make_dense_gather_run(model, opt)
        st = opt.init(params)
        no_eval = jax.device_put(np.full((0, slots), -1, np.int32))

        def dispatch(r, run=run, st=st, no_eval=no_eval):
            _, _, _, rows = run(
                params, st, jax.random.PRNGKey(r), data,
                order_pool[r][None], no_eval,
            )
            return rows[:, 0].sum()

        report[name] = _timed(dispatch, lambda r: (r,), S, args.reps)

    floor = report["empty"]
    out = {
        k: {"us_per_step": round(v * 1e6, 1),
            "us_minus_floor": round((v - floor) * 1e6, 1)}
        for k, v in report.items()
    }
    out["_meta"] = {
        "data_type": args.data_type, "n_tile": n_tile, "slots": slots,
        "steps": S, "adj_mb_per_step": round(slots * n_tile * n_tile * 4 / 1e6, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
