#!/usr/bin/env python
"""On-chip A/B probes for the round-5 DD block-engine levers.

The DD block step anatomy (tools/profile_block_step.py, 2026-08-21)
splits the ~1283 µs train step into prop_grad 606 µs (47%), sortpool
212 µs fwd (~17%), assembly 164 µs. This probe times candidate
replacements for the two dominant pieces, each as one fused
scan-of-`steps` dispatch (same methodology as profile_block_step):

  propagation (4 chained layers, fwd and value_and_grad) — the probe
  rows are a VARIANT MATRIX that was edited across the round-5 A/B
  campaign; the final measured verdicts (all on-chip 2026-08-21, DD
  budgets nb=216/w=1280) live in RESULTS.md "Five measured propagation
  dead-ends". Modes supported by `make_prop_loss`:
    chunked    production path (models/dgcnn.py block_propagate_chunked)
               at a forced _PROP_CHUNK
    full       non-chunked full-budget gather (block_propagate)
    pair       two independent fori accumulator chains per trip
    resident   the VMEM-resident Pallas kernel
               (kernels/block_resident.py)
  with bf16-baked vs int8-binarized pools (`factored` applies the
  per-node dinv scaling outside the propagation — for int8 rows only
  TIMING is faithful; the pool is binarized by sign, not rebuilt).

  sortpool ([S]-node segment formulation, fwd and value_and_grad):
    sp/base          ops/sort_pool.sort_pool (full [S] 3-operand sort)
    sp/topk          two-stage per-block-row lax.top_k prefilter — the
                     SHIPPED round-5 change (ops/sort_pool.py
                     row_block); kept here as the measurement record

Run on the real chip:

    python tools/probe_block_opt.py --data_type DD
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(1, _here)

from profile_step import _timed  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="DD")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.batching.dense import order_matrix
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models import dgcnn as M
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    import importlib

    # the ops package re-exports the sort_pool FUNCTION under the same
    # name, shadowing the module attribute — import the module explicitly
    SP = importlib.import_module("dgcnn_tpu.ops.sort_pool")
    from dgcnn_tpu.train.cv import DeviceCooEngine

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(
        rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)]
    )
    slots = -(-args.batch_size // 8) * 8
    model = DGCNN(num_features=train.num_features,
                  num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)
    Ws = [params["gcn"][i]["w"] for i in range(4)]

    dev_host = build_block_graphset(train)
    bs = dev_host.pool.shape[1]
    nb_all = dev_host.nb.astype(np.int64)
    wc_all = dev_host.block_count.astype(np.int64)

    sh = np.random.default_rng(7)
    # budgets over many sampled epochs (the production engine sizes its
    # budgets over the whole run) — the fixed batch itself is one step
    rows = []
    while len(rows) < 200:
        rows.extend(order_matrix(sh.permutation(train.num_graphs),
                                 args.batch_size, slots))
    order = rows[0]
    bn, bw = block_batch_extents(nb_all, wc_all, np.stack(rows[:200]))
    nb_budget = DeviceCooEngine._geom_round(max(bn, 8), 8)
    w_budget = DeviceCooEngine._geom_round(max(bw, 64), 64)

    pool_bf16 = jax.device_put(dev_host.pool.astype(jnp.bfloat16))
    pool_int8 = jax.device_put(
        (dev_host.pool != 0).astype(np.int8)
    )
    # timing stand-in for the per-node dinv vector (values irrelevant)
    dinv = jax.device_put(
        np.random.default_rng(3).random(nb_budget * bs, np.float32)
    )
    dev = jax.device_put(dev_host)
    fixed = jax.block_until_ready(jax.jit(
        lambda d, row: gather_block_batch(d, row, nb_budget, w_budget)
    )(dev, jax.device_put(order)))
    S = args.steps
    report = {}

    def _pair_core(hb, pool, ip, rows, cols, num_items, chunk, nsegs):
        w = ip.shape[0]
        step = 2 * chunk
        w_pad = -(-w // step) * step
        sentinel = pool.shape[0] - 1
        ip = M._pad_items(ip, w_pad, sentinel)
        rows = M._pad_items(rows, w_pad, nsegs - 1)
        cols = M._pad_items(cols, w_pad, 0)
        trips = jnp.minimum(
            (num_items.astype(jnp.int32) + step - 1) // step, w_pad // step
        )
        bsz, f = hb.shape[1], hb.shape[2]

        def one(st, out):
            ipc = jax.lax.dynamic_slice_in_dim(ip, st, chunk)
            rc = jax.lax.dynamic_slice_in_dim(rows, st, chunk)
            cc = jax.lax.dynamic_slice_in_dim(cols, st, chunk)
            blocks = pool[ipc].astype(hb.dtype)
            parts = jnp.einsum("wij,wjf->wif", blocks, hb[cc],
                               preferred_element_type=jnp.float32)
            return out + jax.ops.segment_sum(
                parts, rc, num_segments=nsegs, indices_are_sorted=True)

        def body(k, carry):
            a, b = carry
            st = k * step
            return one(st, a), one(st + chunk, b)

        z = jnp.zeros((nsegs, bsz, f), jnp.float32) + 0.0 * hb.astype(
            jnp.float32).sum()
        a, b = jax.lax.fori_loop(0, trips, body, (z, z))
        return a + b

    def make_pair_propagate(chunk):
        """Chunked propagation with TWO independent accumulators per
        fori trip (the block-COO kernel's N_ACC idea at the XLA level):
        the two chunks' gather→einsum→segment-sum chains share no carry
        dependence inside a trip, so their HBM streams can overlap.
        Backward mirrors the production col-major traversal."""

        @jax.custom_vjp
        def prop(hb, pool, ip, rows, cols, permT, colsT, num_items):
            nb = hb.shape[0]
            return _pair_core(
                hb, pool, ip, rows, cols, num_items, chunk, nb + 1
            )[:nb]

        def fwd(hb, pool, ip, rows, cols, permT, colsT, num_items):
            out = prop(hb, pool, ip, rows, cols, permT, colsT, num_items)
            return out, (pool, ip, rows, permT, colsT, num_items)

        def bwd(res, g):
            pool, ip, rows, permT, colsT, num_items = res
            nb, bsz, f = g.shape
            g_pad = jnp.concatenate([g, jnp.zeros((1, bsz, f), g.dtype)])
            ipT = ip[permT]
            rowsT = rows[permT]
            # transposed pass: parts = B^T @ g[rowsT], segment by colsT
            d_hb = _pair_core_T(
                g_pad, pool, ipT, rowsT, colsT, num_items, chunk, nb + 1
            )[:nb]
            import numpy as _np

            f0 = jax.dtypes.float0
            zi = lambda a: _np.zeros(a.shape, dtype=f0)
            return (d_hb.astype(jnp.bfloat16), jnp.zeros_like(pool),
                    zi(ip), zi(rows), zi(rows), zi(permT), zi(colsT),
                    zi(num_items))

        prop.defvjp(fwd, bwd)
        return prop

    def _pair_core_T(g_pad, pool, ipT, rowsT, colsT, num_items, chunk,
                     nsegs):
        w = ipT.shape[0]
        step = 2 * chunk
        w_pad = -(-w // step) * step
        sentinel = pool.shape[0] - 1
        ipT = M._pad_items(ipT, w_pad, sentinel)
        rowsT = M._pad_items(rowsT, w_pad, g_pad.shape[0] - 1)
        colsT = M._pad_items(colsT, w_pad, nsegs - 1)
        trips = jnp.minimum(
            (num_items.astype(jnp.int32) + step - 1) // step, w_pad // step
        )
        bsz, f = g_pad.shape[1], g_pad.shape[2]
        bdt = jnp.bfloat16

        def one(st, out):
            ipc = jax.lax.dynamic_slice_in_dim(ipT, st, chunk)
            rc = jax.lax.dynamic_slice_in_dim(rowsT, st, chunk)
            cc = jax.lax.dynamic_slice_in_dim(colsT, st, chunk)
            blocks = pool[ipc].astype(bdt)
            parts = jnp.einsum("wij,wif->wjf", blocks,
                               g_pad[rc].astype(bdt),
                               preferred_element_type=jnp.float32)
            return out + jax.ops.segment_sum(
                parts, cc, num_segments=nsegs, indices_are_sorted=True)

        def body(k, carry):
            a, b = carry
            st = k * step
            return one(st, a), one(st + chunk, b)

        z = jnp.zeros((nsegs, bsz, f), jnp.float32) + 0.0 * g_pad.astype(
            jnp.float32).sum()
        a, b = jax.lax.fori_loop(0, trips, body, (z, z))
        return a + b

    pair_props = {}

    def pair_propagate(hb, pool, fx, chunk):
        if chunk not in pair_props:
            pair_props[chunk] = make_pair_propagate(chunk)
        return pair_props[chunk](
            hb, pool, fx.item_pool, fx.item_row, fx.item_col,
            fx.item_permT, fx.item_colT, fx.num_items,
        )

    def make_prop_loss(pool, chunk, factored, mode="chunked"):
        def prop_loss(ws, fx, pool, dinv, seed):
            h = fx.x + seed
            for w in ws:
                hw = jnp.dot(h, w[: h.shape[-1]],
                             preferred_element_type=jnp.float32)
                if factored:
                    hw = hw * dinv[:, None]
                hb = hw.astype(jnp.bfloat16).reshape(nb_budget, bs, -1)
                if mode == "resident":
                    from dgcnn_tpu.kernels.block_resident import (
                        block_propagate_resident,
                    )

                    agg = block_propagate_resident(
                        hb, pool, fx.item_pool, fx.item_row, fx.item_col,
                        fx.item_permT, fx.item_colT,
                        jax.default_backend() not in ("tpu", "axon"),
                    )
                elif mode == "pair":
                    agg = pair_propagate(hb, pool, fx, chunk)
                elif mode == "full":
                    # non-chunked: one full-budget gather + einsum +
                    # sorted segment-sum, fully pipelined by XLA (pays
                    # the budget padding, skips the round latency)
                    agg = M.block_propagate(
                        hb, pool[fx.item_pool].astype(hb.dtype),
                        fx.item_row, fx.item_col, fx.item_permT,
                        fx.item_colT,
                    )
                else:
                    old = M._PROP_CHUNK
                    M._PROP_CHUNK = chunk
                    try:
                        agg = M.block_propagate_chunked(
                            hb, pool, fx.item_pool, fx.item_row,
                            fx.item_col, fx.item_permT, fx.item_colT,
                            fx.num_items,
                        )
                    finally:
                        M._PROP_CHUNK = old
                agg = agg.reshape(nb_budget * bs, -1)
                if factored:
                    agg = agg * dinv[:, None]
                h = jnp.tanh(agg)
            return jnp.sum(h)

        return prop_loss

    for name, pool, chunk, factored, mode in (
        ("base", pool_bf16, 256, False, "chunked"),
        ("base_resident", pool_bf16, 0, False, "resident"),
        ("int8_resident", pool_int8, 0, True, "resident"),
    ):
        prop_loss = make_prop_loss(pool, chunk, factored, mode)

        @jax.jit
        def prop_fwd(ws, fx, pool, dinv, seed, prop_loss=prop_loss):
            def body(c, _):
                return c + prop_loss(ws, fx, pool, dinv, c * 1e-9 + seed), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
            return c

        @jax.jit
        def prop_grad(ws, fx, pool, dinv, seed, prop_loss=prop_loss):
            def body(c, _):
                v, g = jax.value_and_grad(prop_loss)(
                    ws, fx, pool, dinv, c * 1e-9 + seed
                )
                return c + v + g[0][0, 0], ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
            return c

        report[f"prop_fwd/{name}"] = _timed(
            prop_fwd, lambda r: (Ws, fixed, pool, dinv, jnp.float32(r)),
            S, args.reps,
        )
        report[f"prop_grad/{name}"] = _timed(
            prop_grad, lambda r: (Ws, fixed, pool, dinv, jnp.float32(r)),
            S, args.reps,
        )

    # ---- sortpool: current full sort vs two-stage top-k prefilter ------
    cat_fixed = jax.block_until_ready(jax.jit(
        lambda k: jax.random.normal(k, (nb_budget * bs, 97), jnp.float32)
    )(jax.random.PRNGKey(5)))
    node_graph = fixed.node_graph

    def sp_base(cat, ng):
        return SP.sort_pool(cat, ng, slots, 30)

    def sp_topk(cat, ng):
        # stage 1: per-block-row top-k on the sort key; candidates carry
        # their original node index (tie order identical to the full sort:
        # stable sort + lower-index-first top_k)
        k = 30
        n = cat.shape[0]
        key = cat[:, -1].astype(jnp.float32)
        # padded nodes (ng == slots) must rank below every real node
        keym = jnp.where(ng < slots, key, -jnp.inf).reshape(-1, bs)
        _, idx = jax.lax.top_k(keym, k)  # [nb, k] within-row, ties → low idx
        cand = (
            idx + (jnp.arange(nb_budget, dtype=jnp.int32) * bs)[:, None]
        ).reshape(-1)  # [nb*k] original node rows
        g_c = jnp.take(ng, cand)
        key_c = jnp.take(key, cand)
        # stage 2: the sort_pool tail on the candidate set. Candidates
        # enter in (block-row, rank) order == original node order for
        # equal keys, so the stable sort reproduces the full-sort ties.
        g_sorted, _, perm = jax.lax.sort(
            (g_c.astype(jnp.int32), -key_c,
             jnp.arange(cand.shape[0], dtype=jnp.int32)), num_keys=2
        )
        starts = jnp.searchsorted(
            g_sorted, jnp.arange(slots, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        pos = starts[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
        ends = jnp.concatenate([starts[1:], jnp.searchsorted(
            g_sorted, jnp.asarray([slots], jnp.int32), side="left"
        ).astype(jnp.int32)])
        valid = (pos < ends[:, None]).reshape(-1)
        pos = jnp.minimum(pos, cand.shape[0] - 1).reshape(-1)
        rows = jnp.take(cand, jnp.take(perm, pos))
        rows_grad = jnp.where(
            valid, rows, n + jnp.arange(rows.shape[0], dtype=jnp.int32)
        )
        pooled = SP._unique_rows_gather(cat, rows_grad)
        pooled = jnp.where(valid[:, None], pooled, 0)
        return pooled.reshape(slots, k, cat.shape[1])

    # correctness cross-check on the fixed batch (host, any backend)
    want = np.asarray(jax.jit(sp_base)(cat_fixed, node_graph))
    got = np.asarray(jax.jit(sp_topk)(cat_fixed, node_graph))
    sp_ok = bool(np.array_equal(want, got))

    for name, fn in (("base", sp_base), ("topk", sp_topk)):
        def sp_loss(cat, ng, seed, fn=fn):
            return fn(cat + seed * 1e-9, ng).sum()

        @jax.jit
        def sp_fwd(cat, ng, seed, sp_loss=sp_loss):
            def body(c, _):
                return c + sp_loss(cat, ng, c * 1e-9 + seed), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
            return c

        @jax.jit
        def sp_grad(cat, ng, seed, sp_loss=sp_loss):
            def body(c, _):
                v, g = jax.value_and_grad(sp_loss)(cat, ng, c * 1e-9 + seed)
                return c + v + g[0, 0], ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=S)
            return c

        report[f"sp_fwd/{name}"] = _timed(
            sp_fwd, lambda r: (cat_fixed, node_graph, jnp.float32(r)),
            S, args.reps,
        )
        report[f"sp_grad/{name}"] = _timed(
            sp_grad, lambda r: (cat_fixed, node_graph, jnp.float32(r)),
            S, args.reps,
        )

    out = {k: round(v * 1e6, 1) for k, v in report.items()}
    out["_meta"] = {
        "data_type": args.data_type, "nb_budget": nb_budget,
        "w_budget": w_budget, "slots": slots, "steps": S,
        "sp_topk_matches_base": sp_ok,
        "units": "us_per_step",
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
