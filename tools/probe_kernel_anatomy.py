"""Cycle-level anatomy of the block-pair COO SpMM kernel (VERDICT r2 #3).

BENCH_r02 put `kernels/spmm_block_coo.py` at ~21% of its own MXU
roofline. The kernel's streams are ALL VMEM-resident (there is no HBM
DMA to double-buffer — the round-2 review's suggested fix does not
apply), so the unexplained ~5x must be some mix of:

  (a) VPU selector builds — per item, two (BS, EB) compare/select
      sweeps feed the MXU; VPU work that may serialize with the dots;
  (b) MXU issue latency — each item is two small DEPENDENT matmuls
      (A-build -> A@h); with only 2-deep software pipelining
      (two accumulators) the systolic array may sit idle in the
      dependence shadow;
  (c) scalar/loop overhead — per item: two scalar reads, three dynamic
      (1, EB) row slices, predicated second lane.

This probe times kernel VARIANTS that surgically remove one cost at a
time on the standard microbench shape, plus deeper-unroll candidates:

  base      — the production kernel (2 accumulators)
  unroll4   — 4 accumulators, 4 items/iteration (deeper MXU pipeline)
  sel_const — selectors replaced by loop-invariant constants (WRONG
              math, same dot shapes): isolates (a) as base - sel_const
  no_abuild — A-build dot removed, A = broadcast of w row (WRONG math,
              keeps selector builds + A@h): isolates the big dot
  no_ah     — A@h removed (acc += A[:, :F]): isolates the small dot
  bf16_sel  — selectors built/fed in bfloat16 (candidate FIX, exact
              same math: selector values are exactly representable 0/1
              and w; MXU default precision rounds fp32 operands to bf16
              anyway, and packed bf16 may halve the VPU sweep)
  empty     — whole item body = acc += const: pure loop/scalar floor

Timings use the unroll+floor-subtraction methodology of
utils/profiling.spmm_microbench (a fori_loop iteration costs ~0.5 ms on
this transport). Variants that compute wrong values still time the same
instruction mix; the production kernel's correctness is pinned by
tests/test_spmm_block_coo.py, and the `base` variant here is asserted
equal to the library path.

Hypothesis going in: the per-item VPU selector sweep is ~2·BS·EB =
65,536 compare/select lanes against only ~2-3 µs of MXU dot work — if
(a) dominates, the kernel is VPU-bound and "percent of MXU" was the
wrong roofline altogether.

MEASURED (2026-08-20, v5e, N=2048 F=32 E=8192 batch structure, W=56
EB=256 fill=0.571). Two runs: A = morning (shared host with a pytest
gate, original 20-iter methodology), B = evening (bracketed floor,
80×32 chains, floor healthy at 367 µs/iter):

    variant        A (µs/op)   B (µs/op)
    base (2-acc)     6.46        17.62
    unroll4          4.16        18.36
    sel_const        6.92        17.47
    no_abuild        1.21        11.59
    no_ah            (neg)       10.40
    empty            (neg)        1.38
    bf16_sel       Mosaic INTERNAL compile error via the remote
                   compile helper both runs — not pursued.

What is ROBUST across runs (and what is not):
  * sel_const ≈ base in both → selector builds are ~free; the VPU
    hypothesis (a) is REFUTED both times.
  * no_abuild ≪ base in both → the (BS,EB)×(EB,BS) A-build dot is the
    dominant cost; hypothesis (b) is the standing explanation.
  * unroll4-vs-base is NOT robust: 1.55× win in run A, equal within
    noise in run B; day-long bench spmm rows on identical code swung
    6-17 µs/op (14-37% "of MXU") with transport state. Verdict:
    N_ACC=4 is neutral-to-positive — kept because it never measured
    worse — but the honest primary evidence for the round's perf is
    the END-TO-END epoch chain (DD 42.08 → 31.2 ms via chunked
    propagation + segment mapping), which timed stably all day.
  * Absolute µs from this probe are transport-state-dependent even
    with a healthy floor; treat ratios only.

Methodology note (2026-08-20, late): a floor measured only UP-FRONT
absorbs the transport's per-process warmup and can exceed every
variant's time (all-negative rows observed on a quiet host); the probe
now burns warmup dispatches and brackets the variants with floor
measurements, subtracting the min. Even so, this transport
intermittently degrades 3-7× for minutes at a time — when
floor_us_per_iter prints far above ~500 µs (40-iter chains), discard
the run; the bench spmm rows (fused on-device loops) are the robust
cross-check for absolutes.

Usage (repo root, chip up): python tools/probe_kernel_anatomy.py
Prints one JSON line {variant: us_per_op, ...} (or {"error": ...}).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dgcnn_tpu.kernels.spmm_block_coo import BS

    def make_kernel(mode: str, n_acc: int):
        def kernel(rp_ref, ic_ref, ls_ref, ld_ref, w_ref, h_ref, out_ref,
                   *accs):
            r = pl.program_id(0)
            start = rp_ref[r]
            n = rp_ref[r + 1] - start
            for a in accs:
                a[...] = jnp.zeros_like(a)
            eb = ls_ref.shape[1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (BS, eb), 0)

            def item(j, which):
                c = ic_ref[j]
                if mode == "empty":
                    which[...] += 1.0
                    return
                w = w_ref[pl.ds(j, 1), :]
                if mode == "sel_const":
                    # loop-invariant operands: same dot shapes, no
                    # per-item VPU build (compiler may hoist, which is
                    # exactly the point — what's left is dots + loop).
                    # Real nonzero data (w row 0) so nothing folds away.
                    sel_dst_w = jnp.broadcast_to(
                        w_ref[pl.ds(0, 1), :], (BS, eb)
                    )
                    sel_src = sel_dst_w
                elif mode == "bf16_sel":
                    ls = ls_ref[pl.ds(j, 1), :]
                    ld = ld_ref[pl.ds(j, 1), :]
                    # same values (0/1 and w are bf16-exact at these
                    # magnitudes only if w is — w here is small noise,
                    # so bf16 w rounds: timing-faithful, math ~equal)
                    sel_dst_w = jnp.where(
                        ld == iota, w.astype(jnp.bfloat16), jnp.bfloat16(0)
                    )
                    sel_src = (ls == iota).astype(jnp.bfloat16)
                else:
                    ls = ls_ref[pl.ds(j, 1), :]
                    ld = ld_ref[pl.ds(j, 1), :]
                    sel_dst_w = jnp.where(ld == iota, w, 0.0)
                    sel_src = (ls == iota).astype(jnp.float32)
                if mode == "no_abuild":
                    a = jnp.broadcast_to(
                        sel_dst_w[:, :1] + sel_src[:, :1], (BS, BS)
                    )
                else:
                    a = jax.lax.dot_general(
                        sel_dst_w, sel_src, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                if mode == "no_ah":
                    f = which.shape[1]
                    which[...] += a[:, :f]
                else:
                    which[...] += jnp.dot(
                        a.astype(h_ref.dtype), h_ref[c],
                        preferred_element_type=jnp.float32,
                    )

            def body(k, carry):
                j = start + n_acc * k
                item(j, accs[0])
                for t in range(1, n_acc):
                    @pl.when(j + t < start + n)
                    def _(t=t):
                        item(j + t, accs[t])
                return carry

            jax.lax.fori_loop(0, (n + n_acc - 1) // n_acc, body, 0)
            total = accs[0][...]
            for a in accs[1:]:
                total = total + a[...]
            out_ref[0] = total.astype(out_ref.dtype)

        return kernel

    def forward(kernel, n_acc, row_ptr, item_c, ls, ld, w_pad, h,
                interpret=False):
        n, f = h.shape
        nb = n // BS
        wn, eb = ls.shape
        hb = h.reshape(nb, BS, f)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((1, BS, f), lambda i, rp, ic: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((BS, f), jnp.float32)] * n_acc,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, BS, f), h.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * wn * BS * (eb + f) * BS,
                bytes_accessed=2 * n * f * 4 + 3 * wn * eb * 4,
                transcendentals=0,
            ),
        )(row_ptr, item_c, ls, ld, w_pad, hb)
        return out.reshape(n, f)

    return make_kernel, forward


def main() -> int:
    from dgcnn_tpu.utils.platform import probe_accelerator

    if "--no-probe" not in sys.argv and not probe_accelerator(timeout_s=150.0):
        print("probe_kernel_anatomy: accelerator probe FAILED", file=sys.stderr)
        print(json.dumps({"error": "probe_failed"}))
        return 1

    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.kernels.spmm_block_coo import (
        build_block_coo,
        pad_weights,
        spmm_block_coo,
        pad_weights_t,
    )
    from dgcnn_tpu.utils.profiling import _batch_edges

    make_kernel, forward = _variants()

    num_nodes, num_features, num_edges = 2048, 32, 8192
    rng = np.random.default_rng(0)
    src_np, dst_np, w_np = _batch_edges(rng, num_nodes, num_edges)
    s = build_block_coo(src_np, dst_np, num_nodes)
    w_pad = jnp.asarray(pad_weights(s, w_np))
    h0 = rng.normal(size=(num_nodes, num_features)).astype(np.float32) * 0.01
    meta = {
        "W": int(s.ls.shape[0]), "EB": int(s.meta.eb),
        "fill": round(s.meta.fill, 3), "edges": int(s.meta.num_edges),
    }
    print(f"structure: {meta}", file=sys.stderr)

    # sanity: probe 'base' (the 2-acc pre-round-3 configuration) matches
    # the library kernel numerically — NOTE the shipped kernel is N_ACC=4
    # since the unroll4 A/B landed, so 'unroll4' is the production
    # configuration here and 'base' is the historical baseline
    base_out = forward(
        make_kernel("base", 2), 2, s.row_ptr, s.item_c, s.ls, s.ld, w_pad,
        jnp.asarray(h0),
    )
    lib_out = spmm_block_coo(
        s, w_pad, jnp.asarray(pad_weights_t(s, w_np)), jnp.asarray(h0), False
    )
    np.testing.assert_allclose(
        np.asarray(base_out), np.asarray(lib_out), rtol=2e-5, atol=1e-7
    )

    # iters amortizes the ~30 ms transport round-trip per dispatch
    # (floor/iter = RT/iters: at iters=20 the floor is ~1.5 ms with
    # ±ms jitter that SWAMPS a ~100 µs/iter op signal — the source of
    # the earlier all-negative runs); unroll deepens the op signal per
    # iteration. 80×32 puts signal ≈ jitter×5.
    iters, unroll, reps = 80, 32, 4

    def time_variant(mode, n_acc):
        kern = make_kernel(mode, n_acc)

        @jax.jit
        def chain(h):
            def body(_, acc):
                for _ in range(unroll):
                    acc = forward(
                        kern, n_acc, s.row_ptr, s.item_c, s.ls, s.ld,
                        w_pad, acc,
                    ) * 0.5 + acc * 0.5
                return acc

            return jax.lax.fori_loop(0, iters, body, h).sum()

        float(chain(jnp.asarray(h0)))  # compile
        times = []
        for r in range(reps):
            hr = jnp.asarray(h0 + r * 1e-4)
            t0 = time.perf_counter()
            float(chain(hr))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    @jax.jit
    def floor_chain(h):
        def body(_, acc):
            for _ in range(unroll):
                acc = acc * 1.0001
            return acc

        return jax.lax.fori_loop(0, iters, body, h).sum()

    def measure_floor():
        float(floor_chain(jnp.asarray(h0)))
        floors = []
        for r in range(reps):
            t0 = time.perf_counter()
            float(floor_chain(jnp.asarray(h0 + r * 1e-4)))
            floors.append(time.perf_counter() - t0)
        return min(floors) / iters

    # transport warmup: the FIRST timed dispatches of a process bear
    # residual warmup/stall cost on this tunnel — a floor measured only
    # up-front inflates and drives every variant delta negative
    # (observed 2026-08-20: all-negative anatomy rows on a quiet host).
    # Burn a few dispatches, then bracket the run with floor
    # measurements and subtract the MIN of the two.
    for _ in range(3):
        float(floor_chain(jnp.asarray(h0)))
    floor_start = measure_floor()

    out = dict(meta)
    raw = {}
    for mode, n_acc in (
        ("base", 2), ("unroll4", 4), ("sel_const", 2),
        ("no_abuild", 2), ("no_ah", 2), ("bf16_sel", 2), ("empty", 2),
    ):
        try:
            raw[mode] = time_variant(mode, n_acc)
        except Exception as exc:
            out[mode] = {"error": repr(exc)[:200]}
            print(f"{mode}: {out[mode]}", file=sys.stderr)
    floor = min(floor_start, measure_floor())
    out["floor_us_per_iter"] = round(floor * 1e6, 1)
    for mode, t in raw.items():
        out[mode] = round((t - floor) / unroll * 1e6, 2)
        print(f"{mode}: {out[mode]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
