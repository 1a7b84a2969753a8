#!/usr/bin/env python
"""Op-level trace of ONE unfused block-engine training step (DD).

Same method as tools/probe_lockstep_trace.py (the fused scan hides ops
inside one while event): jit the single train step — on-device
assembly + apply_block fwd/bwd + Adam — and run it repeatedly under
jax.profiler for tools/summarize_trace.py. This is the trace that
cross-checks the timing-difference anatomy of
tools/profile_block_step.py at op granularity.

    python tools/probe_block_trace.py --logdir /tmp/prof_block
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="DD")
    p.add_argument("--logdir", default="/tmp/prof_block")
    p.add_argument("--calls", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.batching.dense import order_matrix
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_block, init_params
    from dgcnn_tpu.train.cv import DeviceCooEngine
    from dgcnn_tpu.train.loop import nll_loss_and_correct
    from dgcnn_tpu.utils.profiling import trace

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(
        rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)]
    )
    slots = 56
    model = DGCNN(num_features=train.num_features,
                  num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    import dataclasses

    dev_host = build_block_graphset(train)
    dev_host = dataclasses.replace(
        dev_host, pool=dev_host.pool.astype(jnp.bfloat16)
    )
    dev = jax.device_put(dev_host)
    sh = np.random.default_rng(7)
    rows = []
    while len(rows) < 100:
        rows.extend(order_matrix(sh.permutation(train.num_graphs), 50,
                                 slots))
    bn, bw = block_batch_extents(
        dev_host.nb.astype(np.int64),
        dev_host.block_count.astype(np.int64), np.stack(rows[:100]),
    )
    nb_budget = DeviceCooEngine._geom_round(max(bn, 8), 8)
    w_budget = DeviceCooEngine._geom_round(max(bw, 64), 64)
    idx = jax.device_put(np.asarray(rows[0]))

    # dev passed as an ARGUMENT: closing over the block pool inlines it
    # as HLO constants and the transport's remote_compile rejects the
    # request body (HTTP 413 — the profile_block_step.py note)
    @jax.jit
    def step(params, opt_state, key, d, idx_row):
        def loss(p):
            batch = gather_block_batch(d, idx_row, nb_budget, w_budget)
            lp = apply_block(p, model, batch, d.pool,
                             deterministic=False, dropout_rng=key)
            l, _ = nll_loss_and_correct(lp, batch.y, batch.graph_mask)
            return l

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    key = jax.random.PRNGKey(0)
    params, opt_state, l = step(params, opt_state, key, dev, idx)
    float(l)
    with trace(args.logdir):
        for _ in range(args.calls):
            params, opt_state, l = step(params, opt_state, key, dev, idx)
        float(l)
    print("traced", args.calls, "steps ->", args.logdir)


if __name__ == "__main__":
    main()
