"""Sub-stage anatomy of on-device block-batch ASSEMBLY (DD's #2 cost).

The DD block-step anatomy (tools/profile_block_step.py, 2026-08-20)
puts `gather_block_batch` at ~280-310 µs/step — second only to
propagation after the chunking change — yet its visible work is small:
two searchsorted calls over [nb_budget]/[w_budget] grids, a handful of
index gathers, and one [nb_budget, bs, F] x-block gather (~10 MB on
DD). This probe times stripped assembly variants to locate the cost:

  empty     scan floor
  node_idx  node-side index math only (searchsorted over block-rows,
            slot/qin/xb_row/node_ok — no x gather, no item side)
  item_idx  work-item index math only (searchsorted over w_budget,
            pool ids, row/col rebase, permT/colT)
  xgather   node_idx + the x_blocks gather (the HBM stream)
  full      the production gather_block_batch
  cmp_ss    full, with searchsorted replaced by the compare-matrix
            formulation ((pos[:, None] >= cum[None, 1:]).sum(1) —
            O(n·slots) VPU compares instead of a lowered binary
            search) — the candidate fix if searchsorted dominates

Usage (repo root, chip up): python tools/probe_assemble_anatomy.py
  [--data_type DD] [--steps 40]
Prints one JSON line of µs/step over the empty floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_type", default="DD")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args(argv)

    if not args.force_cpu:
        from dgcnn_tpu.utils.platform import probe_accelerator

        if not args.no_probe and not probe_accelerator(timeout_s=150.0):
            print(json.dumps({"error": "probe_failed"}))
            return 1

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from profile_step import _timed

    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.batching.dense import order_matrix
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.train.cv import DeviceCooEngine

    gs, _ = load_dataset(args.data_type, allow_download=False,
                         allow_synthetic=True)
    rng = np.random.default_rng(324)
    train = gs.subset(
        rng.permutation(gs.num_graphs)[: int(gs.num_graphs * 0.9)]
    )
    slots = -(-args.batch_size // 8) * 8
    dev_host = build_block_graphset(train)
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
    bs = dev_host.pool.shape[1]
    report = {}

    @jax.jit
    def empty(seed):
        def body(c, i):
            return c + i, ()
        c, _ = jax.lax.scan(body, seed, jnp.arange(S, dtype=jnp.float32))
        return c

    floor = _timed(empty, lambda r: (jnp.float32(r),), S, args.reps) * 1e6
    report["empty"] = {"us_per_step": round(floor, 1)}

    def node_index_math(d, idx_row, searchsorted):
        slots_n = idx_row.shape[0]
        ngt = d.block_start.shape[0] - 1
        valid = idx_row >= 0
        g = jnp.where(valid, idx_row, ngt)
        nbs = d.nb[g]
        bo = jnp.concatenate([jnp.zeros(1, nbs.dtype), jnp.cumsum(nbs)])
        q = jnp.arange(nb_budget, dtype=jnp.int32)
        slot = searchsorted(bo[1:], q)
        slot_c = jnp.minimum(slot, slots_n - 1)
        q_ok = q < bo[slots_n]
        qin = q - bo[slot_c]
        xb_row = jnp.where(q_ok, d.bofs[g[slot_c]] + qin,
                           d.x_blocks.shape[0] - 1)
        lane = jnp.arange(bs, dtype=jnp.int32)
        n_of = d.node_count[g[slot_c]]
        node_ok = q_ok[:, None] & (
            (qin[:, None] * bs + lane[None, :]) < n_of[:, None]
        )
        return xb_row, node_ok, g, bo, valid

    def item_index_math(d, idx_row, g, bo, valid, searchsorted):
        slots_n = idx_row.shape[0]
        wc = d.block_count[g]
        wo = jnp.concatenate([jnp.zeros(1, wc.dtype), jnp.cumsum(wc)])
        wpos = jnp.arange(w_budget, dtype=jnp.int32)
        wslot = searchsorted(wo[1:], wpos)
        wslot_c = jnp.minimum(wslot, slots_n - 1)
        j = wpos - wo[wslot_c]
        w_ok = wpos < wo[slots_n]
        gw = g[wslot_c]
        sentinel_pool = d.pool.shape[0] - 1
        pool_id = jnp.where(w_ok, d.block_start[gw] + j,
                            sentinel_pool).astype(jnp.int32)
        base = bo[wslot_c].astype(jnp.int32)
        item_row = jnp.where(w_ok, base + d.block_row[pool_id], nb_budget)
        item_col = jnp.where(w_ok, base + d.block_col[pool_id], 0)
        jt = d.trperm[jnp.where(w_ok, d.block_start[gw] + j, sentinel_pool)]
        permT = jnp.where(w_ok, wpos - j + jt, wpos)
        pool_idT = jnp.where(w_ok, d.block_start[gw] + jt, sentinel_pool)
        item_colT = jnp.where(w_ok, base + d.block_col[pool_idT], nb_budget)
        return pool_id, item_row, item_col, permT, item_colT

    ss_native = lambda cum, pos: jnp.searchsorted(
        cum, pos, side="right"
    ).astype(jnp.int32)
    # compare-matrix substitute: position p belongs to the first segment
    # whose cumulative end exceeds it → count of ends ≤ p
    ss_cmp = lambda cum, pos: (
        pos[:, None] >= cum[None, :]
    ).sum(axis=1).astype(jnp.int32)

    def run_variant(name, fn):
        @jax.jit
        def prog(d, order2d, seed):
            def body(c, idx_row):
                return c + fn(d, idx_row) + seed, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), order2d)
            return c

        us = _timed(prog, lambda i: (dev, order_pool[i], jnp.float32(i)),
                    S, args.reps) * 1e6
        report[name] = {
            "us_per_step": round(us, 1),
            "us_minus_floor": round(us - floor, 1),
        }
        print(f"{name}: {report[name]}", file=sys.stderr)

    def v_node_idx(d, idx_row):
        xb_row, node_ok, g, bo, valid = node_index_math(d, idx_row, ss_native)
        return (xb_row.sum() + node_ok.sum() + g.sum()).astype(jnp.float32)

    def v_item_idx(d, idx_row):
        _, _, g, bo, valid = node_index_math(d, idx_row, ss_native)
        outs = item_index_math(d, idx_row, g, bo, valid, ss_native)
        return sum(o.sum() for o in outs).astype(jnp.float32)

    def v_xgather(d, idx_row):
        xb_row, node_ok, g, bo, valid = node_index_math(d, idx_row, ss_native)
        x = d.x_blocks[xb_row]
        return x.sum() + node_ok.sum().astype(jnp.float32)

    def v_full(d, idx_row):
        b = gather_block_batch(d, idx_row, nb_budget, w_budget)
        return (
            b.x.sum() + b.node_mask.sum()
            + (b.item_pool + b.item_row + b.item_col + b.item_permT
               + b.item_colT).sum().astype(jnp.float32)
        )

    def v_cmp_ss(d, idx_row):
        xb_row, node_ok, g, bo, valid = node_index_math(d, idx_row, ss_cmp)
        x = d.x_blocks[xb_row]
        outs = item_index_math(d, idx_row, g, bo, valid, ss_cmp)
        return (x.sum() + node_ok.sum().astype(jnp.float32)
                + sum(o.sum() for o in outs).astype(jnp.float32))

    run_variant("node_idx", v_node_idx)
    run_variant("item_idx", v_item_idx)
    run_variant("xgather", v_xgather)
    run_variant("full", v_full)
    run_variant("cmp_ss", v_cmp_ss)

    report["_meta"] = {"nb_budget": int(nb_budget), "w_budget": int(w_budget),
                       "slots": int(slots), "steps": S}
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
