#!/usr/bin/env python
"""Ablation anatomy of the BLOCK-SPARSE training step (on-chip).

Sibling of tools/profile_step.py for the block engine (`--layout block`,
batching/block_sparse.py): times stripped-down variants of the fused
train step, each as ONE scan dispatch of `steps` iterations (the
transport adds ~25-30 ms per dispatch), and prints the cost breakdown:

    empty       scan body with a trivial carry (dispatch + scan floor)
    assemble    gather_block_batch only (on-device batch assembly)
    blocks      assemble + pool[item_pool] block gather (the engine's
                dominant HBM stream at fp32)
    prop_fwd    4 chained propagations on a FIXED pre-built batch
                (block_propagate_chunked — the production XLA path)
                (batched MXU matmul + sorted block segment-sum)
    prop_grad   value_and_grad of prop_fwd (fwd + custom-VJP backward)
    fwd         full apply_block forward + loss (assembly included)
    grad        full value_and_grad
    sgd         full step with SGD (isolates Adam)
    full        the real train step (assembly + fwd/bwd + Adam) — the
                program shape BlockSparseEngine dispatches

Differences locate the time: `full − sgd` ≈ Adam, `grad − prop_grad −
assemble − blocks` ≈ sortpool/readout/loss fwd+bwd, `full` × steps ≈
the engine's epoch time (sans eval).

Usage: python tools/profile_block_step.py --data_type DD [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(1, _here)  # for the shared profile_step._timed import


# one timing methodology for every step-anatomy tool — the dense and block
# profilers' rows are only comparable if warm-up, fencing and per-step
# division stay identical
from profile_step import _timed  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="DD")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--adj_dtype", default="float32",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--block_impl", default="xla", choices=["xla", "pallas"],
                   help="propagation impl for the prop/fwd/grad/sgd/full "
                        "rows (kernels/block_pallas.py vs the XLA einsum)")
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

    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.batching.dense import order_matrix
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.models.dgcnn import (
        DGCNN,
        apply_block,
        init_params,
    )
    from dgcnn_tpu.train.cv import DeviceCooEngine
    from dgcnn_tpu.train.loop import make_block_run, nll_loss_and_correct

    from dgcnn_tpu.data.datasets import load_dataset

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)])
    slots = -(-args.batch_size // 8) * 8
    model = DGCNN(num_features=train.num_features, num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)

    dev_host = build_block_graphset(train)
    adj_dt = Config(data_type=args.data_type,
                    adj_dtype=args.adj_dtype).resolved_adj_dtype()
    if adj_dt != "float32":
        import dataclasses

        dev_host = dataclasses.replace(
            dev_host, pool=dev_host.pool.astype(jnp.dtype(adj_dt))
        )
    dev = jax.device_put(dev_host)
    nb_all = dev_host.nb.astype(np.int64)
    wc_all = dev_host.block_count.astype(np.int64)

    sh = np.random.default_rng(7)

    def orders(steps):
        rows = []
        while len(rows) < steps:
            rows.extend(order_matrix(sh.permutation(train.num_graphs),
                                     args.batch_size, slots))
        return np.stack(rows[:steps])

    order_np = [orders(args.steps) for _ in range(args.reps + 1)]
    bn, bw = block_batch_extents(nb_all, wc_all, np.concatenate(order_np))
    nb_budget = DeviceCooEngine._geom_round(max(bn, 8), 8)
    w_budget = DeviceCooEngine._geom_round(max(bw, 64), 64)
    order_pool = [jax.device_put(o) for o in order_np]
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

    # NOTE on jit boundaries: every jitted program below takes the
    # device-resident graphset (and any fixed batch) as EXPLICIT arguments.
    # Closing over them inlines the arrays as HLO constants, and this
    # transport's remote_compile endpoint rejects large request bodies
    # (HTTP 413 observed 2026-08-18 with DD's block pool in a closure).

    # -- assemble: on-device block-batch assembly only --------------------
    @jax.jit
    def assemble(d, order2d, seed):
        def body(c, idx_row):
            b = gather_block_batch(d, idx_row, nb_budget, w_budget)
            # consume every assembled array (else XLA prunes the work)
            return (
                c + b.x.sum() + b.node_mask.sum() + seed
                + (b.item_pool + b.item_row + b.item_col + b.item_permT
                   + b.item_colT).sum().astype(jnp.float32)
            ), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), order2d)
        return c

    report["assemble"] = _timed(
        assemble, lambda r: (dev, order_pool[r], jnp.float32(r)), S, args.reps
    )

    # -- blocks: assembly + the per-step pool block gather -----------------
    @jax.jit
    def blocks_row(d, order2d, seed):
        def body(c, idx_row):
            b = gather_block_batch(d, idx_row, nb_budget, w_budget)
            blk = d.pool[b.item_pool]
            return c + blk.astype(jnp.float32).sum() + b.x.sum() + seed, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), order2d)
        return c

    report["blocks"] = _timed(
        blocks_row, lambda r: (dev, order_pool[r], jnp.float32(r)), S, args.reps
    )

    # -- propagation core on a FIXED pre-assembled batch -------------------
    fixed = jax.block_until_ready(jax.jit(
        lambda d, row: gather_block_batch(d, row, nb_budget, w_budget)
    )(dev, order_pool[0][0]))
    Ws = [params["gcn"][i]["w"] for i in range(4)]
    bs = dev_host.pool.shape[1]
    prop_dt = jnp.bfloat16 if adj_dt == "bfloat16" else jnp.float32

    if args.block_impl == "pallas":
        from dgcnn_tpu.kernels.block_pallas import block_propagate_pallas

        interp = jax.default_backend() not in ("tpu", "axon")
        prop_operand = dev.pool  # pallas gathers its own blocks from the pool

        def _prop(hb, operand, fx):
            return block_propagate_pallas(
                hb, operand, fx.item_pool, fx.item_row,
                fx.item_col, fx.item_permT, fx.item_colT, interp,
            )
    else:
        # the production XLA path (models/dgcnn.py apply_block): chunked
        # propagation gathering pool blocks per chunk, work ∝ real items
        from dgcnn_tpu.models.dgcnn import block_propagate_chunked

        prop_operand = jax.block_until_ready(jax.jit(
            lambda p: p.astype(prop_dt)
        )(dev.pool))

        def _prop(hb, operand, fx):
            return block_propagate_chunked(
                hb, operand, fx.item_pool, fx.item_row, fx.item_col,
                fx.item_permT, fx.item_colT, fx.num_items,
            )

    def prop_loss(ws, fx, operand, seed):
        h = fx.x + seed
        for w in ws:
            hw = jnp.dot(h, w[: h.shape[-1]], preferred_element_type=jnp.float32)
            hb = hw.astype(prop_dt).reshape(nb_budget, bs, -1)
            agg = _prop(hb, operand, fx)
            h = jnp.tanh(agg.reshape(nb_budget * bs, -1))
        return jnp.sum(h)

    @jax.jit
    def prop_fwd(ws, fx, operand, seed):
        def body(c, _):
            return c + prop_loss(ws, fx, operand, c * 1e-9 + seed), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["prop_fwd"] = _timed(
        prop_fwd, lambda r: (Ws, fixed, prop_operand, jnp.float32(r)),
        S, args.reps,
    )

    @jax.jit
    def prop_grad(ws, fx, operand, seed):
        def body(c, _):
            v, g = jax.value_and_grad(prop_loss)(ws, fx, operand,
                                                 c * 1e-9 + seed)
            return c + v + g[0][0, 0], ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["prop_grad"] = _timed(
        prop_grad, lambda r: (Ws, fixed, prop_operand, jnp.float32(r)),
        S, args.reps,
    )

    # -- sortpool on a fixed packed node matrix (the segment formulation:
    # ops/sort_pool.py — sort [S] keys, scatter indices, gather B*k rows) --
    from dgcnn_tpu.ops.sort_pool import sort_pool

    cat_fixed = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (nb_budget * bs, 97), jnp.float32)
    )(jax.random.PRNGKey(5)))

    @jax.jit
    def sortpool(cat, node_graph, seed):
        def body(c, _):
            pooled = sort_pool(cat + c * 1e-9 + seed, node_graph, slots, 30)
            return c + pooled.sum(), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["sortpool"] = _timed(
        sortpool, lambda r: (cat_fixed, fixed.node_graph, jnp.float32(r)),
        S, args.reps,
    )

    # -- full forward / grad (assembly included, no optimizer) -------------
    def step_loss(p, d, idx_row, key):
        batch = gather_block_batch(d, idx_row, nb_budget, w_budget)
        lp = apply_block(p, model, batch, d.pool, deterministic=False,
                         dropout_rng=key, block_impl=args.block_impl)
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
        fwd, lambda r: (params, dev, order_pool[r], jax.random.PRNGKey(r)),
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
        grad, lambda r: (params, dev, order_pool[r], jax.random.PRNGKey(r)),
        S, args.reps,
    )

    # -- full train step under SGD and Adam (the real engine program) ------
    no_eval = jax.device_put(np.full((0, slots), -1, np.int32))
    for name, opt in (("sgd", optax.sgd(1e-3)), ("full", optax.adam(1e-3))):
        run = make_block_run(model, opt, nb_budget, w_budget,
                             block_impl=args.block_impl)
        st = opt.init(params)

        def dispatch(r, run=run, st=st):
            _, _, _, rows = run(
                params, st, jax.random.PRNGKey(r), dev,
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
        "data_type": args.data_type, "nb_budget": nb_budget,
        "w_budget": w_budget, "slots": slots, "steps": S,
        "adj_dtype": adj_dt, "block_impl": args.block_impl,
        "block_mb_per_step": round(
            w_budget * bs * bs * (2 if adj_dt == "bfloat16" else 4) / 1e6, 2
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
