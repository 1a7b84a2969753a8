"""Step anatomy for the MULTI-TILE dense layout (train/cv.py
MultiDenseEngine — the auto default for the COLLAB regime since
2026-08-19). Rows, each a fused S-step scan timed per step:

    empty        dispatch + scan floor
    gather       per-class dense-batch gathers only (the layout's HBM win)
    gcn_fwd      per-class 4-layer GCN trunks on fixed pre-gathered batches
    fwd          full model forward + loss (gather + trunks + sortpool + head)
    grad         fwd + backward
    full         the real train step (gather + fwd/bwd + Adam) — one
                 engine-equivalent epoch dispatch per rep

`fwd − gcn_fwd − gather` ≈ sortpool/readout/loss; `grad − fwd` ≈ backward.
The COLLAB roofline context: per step the MXU work is ~13 µs and the
gather stream ~7 MB (bf16 256-ladder), so anything much above ~40 µs/step
is per-class sequencing / small-op overhead — this tool exists to find it.

Same transport rules as profile_step.py: fused scans, inputs varied per
rep, D2H-fenced, dispatch floor subtracted.
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
    float(fn(*make_args(0)))  # compile + warm
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        float(fn(*make_args(r)))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="COLLAB")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--min_tile", type=int, default=256)
    p.add_argument("--adj_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
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

    from dgcnn_tpu.batching.dense import gather_dense_batch
    from dgcnn_tpu.batching.multi_dense import (
        build_multi_dense_on_device,
        class_batch_counts,
        plan_tiles,
        route_order_rows,
    )
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_multi_dense, init_params
    from dgcnn_tpu.train.loop import make_multi_dense_run, nll_loss_and_correct

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)])
    model = DGCNN(num_features=train.num_features, num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)

    adj_dtype = Config().resolved_adj_dtype() if args.adj_dtype == "auto" \
        else args.adj_dtype
    tiles = plan_tiles(train.node_counts(), args.min_tile)
    classes, routing = build_multi_dense_on_device(
        train, tiles, adj_dtype=adj_dtype
    )

    # fixed per-class slots sized over every order we will time
    sh = np.random.default_rng(7)
    S = args.steps
    bs = args.batch_size

    def epoch_ids(n_rows):
        ids = []
        while len(ids) * bs < n_rows * bs:
            ids.extend(
                sh.permutation(train.num_graphs)[i : i + bs]
                for i in range(0, train.num_graphs - bs + 1, bs)
            )
            if len(ids) >= n_rows:
                break
        return ids[:n_rows]

    all_steps = [epoch_ids(S) for _ in range(args.reps + 1)]
    need = np.full(len(tiles), 4, dtype=np.int64)
    for rep in all_steps:
        for ids in rep:
            c = class_batch_counts(routing, ids, bs)
            need = np.maximum(need, c.max(axis=0))
    slots = tuple(int(-(-n // 4) * 4) for n in need)

    def orders_for(rep):
        rows = [route_order_rows(routing, ids, slots) for ids in all_steps[rep]]
        return tuple(
            jax.device_put(np.stack([r[c] for r in rows]))
            for c in range(len(slots))
        )

    order_pool = [orders_for(r) for r in range(args.reps + 1)]
    report = {}

    # -- empty: dispatch + scan floor -------------------------------------
    @jax.jit
    def empty(seed):
        def body(c, i):
            return c + i, ()
        c, _ = jax.lax.scan(body, seed, jnp.arange(S, dtype=jnp.float32))
        return c

    report["empty"] = _timed(empty, lambda r: (jnp.float32(r),), S, args.reps)

    # -- gather: per-class batch assembly only -----------------------------
    @jax.jit
    def gather(cls, orders, seed):
        def body(c, idx_rows):
            acc = c + seed
            for d, row in zip(cls, idx_rows):
                b = gather_dense_batch(d, row)
                acc = acc + b.adj.sum().astype(jnp.float32) + b.x.sum()
            return acc, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), orders)
        return c

    report["gather"] = _timed(
        gather, lambda r: (classes, order_pool[r], jnp.float32(r)),
        S, args.reps,
    )

    # -- gcn trunks on fixed pre-gathered per-class batches ----------------
    fixed = tuple(
        jax.block_until_ready(jax.jit(gather_dense_batch)(d, o[0]))
        for d, o in zip(classes, order_pool[0])
    )
    Ws = [params["gcn"][i]["w"] for i in range(4)]

    def trunks_loss(ws, batches, seed):
        acc = jnp.float32(0)
        for b in batches:
            h = b.x + seed
            for w in ws:
                h = jnp.tanh(b.adj.astype(h.dtype) @ (h @ w[: h.shape[-1]]))
            acc = acc + jnp.sum(h)
        return acc

    @jax.jit
    def gcn_fwd(ws, batches, seed):
        def body(c, _):
            return c + trunks_loss(ws, batches, c * 1e-9 + seed), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
        return c

    report["gcn_fwd"] = _timed(
        gcn_fwd, lambda r: (Ws, fixed, jnp.float32(r)), S, args.reps
    )

    # -- full forward / grad ------------------------------------------------
    def step_loss(p, cls, idx_rows, key):
        batches = tuple(
            gather_dense_batch(d, row) for d, row in zip(cls, idx_rows)
        )
        lp, y, gm = apply_multi_dense(
            p, model, batches, deterministic=False, dropout_rng=key
        )
        loss, _ = nll_loss_and_correct(lp, y, gm)
        return loss

    @jax.jit
    def fwd(p, cls, orders, key):
        def body(c, idx_rows):
            k, key = jax.random.split(c[1])
            return (c[0] + step_loss(p, cls, idx_rows, k), key), ()
        c, _ = jax.lax.scan(body, (jnp.float32(0), key), orders)
        return c[0]

    report["fwd"] = _timed(
        fwd, lambda r: (params, classes, order_pool[r], jax.random.PRNGKey(r)),
        S, args.reps,
    )

    @jax.jit
    def grad(p, cls, orders, key):
        def body(c, idx_rows):
            k, key = jax.random.split(c[1])
            v, g = jax.value_and_grad(step_loss)(p, cls, idx_rows, k)
            return (c[0] + v + g["gcn"][0]["w"][0, 0], key), ()
        c, _ = jax.lax.scan(body, (jnp.float32(0), key), orders)
        return c[0]

    report["grad"] = _timed(
        grad, lambda r: (params, classes, order_pool[r], jax.random.PRNGKey(r)),
        S, args.reps,
    )

    # -- the real engine program (one epoch dispatch per rep) --------------
    from dgcnn_tpu.train.flat_opt import flatten_optimizer

    no_eval = jax.device_put(tuple(np.zeros((0, s), np.int32) for s in slots))
    for name, opt in (
        ("sgd", optax.sgd(1e-3)),
        ("full", optax.adam(1e-3)),
        # Adam over ONE raveled vector (Config.opt_flatten): full −
        # full_flat = per-leaf optimizer kernel overhead
        ("full_flat", flatten_optimizer(optax.adam(1e-3))),
    ):
        run = make_multi_dense_run(model, opt)
        st = opt.init(params)

        def dispatch(r, run=run, st=st):
            orders = tuple(o[None] for o in order_pool[r])  # [1, S, S_c]
            _, _, _, rows = run(
                params, st, jax.random.PRNGKey(r), classes, orders, no_eval
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
        "data_type": args.data_type, "tiles": list(tiles),
        "slots": list(slots), "steps": S, "adj_dtype": adj_dtype,
        "gather_mb_per_step": round(
            sum(s * t * t for s, t in zip(slots, tiles))
            * (2 if adj_dtype == "bfloat16" else 4) / 1e6, 2,
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
