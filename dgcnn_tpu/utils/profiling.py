"""Profiling utilities: jax.profiler tracing and speed-of-light accounting.

The reference has no tracing/profiling at all (SURVEY §5 row 1). Here:
  * `trace(logdir)` wraps `jax.profiler` for TensorBoard-compatible device
    traces;
  * HBM speed-of-light accounting for the SpMM (the BASELINE "%-of-SoL"
    metric): the kernel's unavoidable HBM traffic divided by measured time
    against the chip's peak bandwidth;
  * `spmm_microbench` times an aggregation kernel in an on-device
    dependency chain (single dispatch, D2H-fenced — see
    .claude/skills/verify/SKILL.md for why both matter on this transport).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np

# TPU v5e (lite) peak HBM bandwidth, GB/s
V5E_HBM_GBPS = 819.0
# TPU v5e peak MXU throughput, bf16 TFLOP/s (XLA's default matmul
# precision on TPU lowers fp32 operands to bf16 passes)
V5E_MXU_BF16_TFLOPS = 197.0
_LANES = 128


def _lane_padded(f: int) -> int:
    return -(-f // _LANES) * _LANES


def spmm_hbm_bytes(num_nodes: int, num_features: int, num_edges: int) -> int:
    """Minimum HBM traffic of one gather-scale-scatter SpMM pass, assuming
    the feature block is HBM-read once and VMEM-resident thereafter
    (kernels/spmm_pallas.py design): edge stream (src,dst,w = 12 B/edge) +
    one read of h + one write of out. Random row gathers that *miss* VMEM
    would add E·row_bytes; this is the speed-of-light floor."""
    fpad = _lane_padded(num_features)
    return num_edges * 12 + 2 * num_nodes * fpad * 4


def pct_of_sol(bytes_moved: int, seconds: float, peak_gbps: float = V5E_HBM_GBPS) -> float:
    if seconds <= 0:
        return 0.0
    return (bytes_moved / seconds) / (peak_gbps * 1e9) * 100.0


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _batch_edges(rng, num_nodes: int, num_edges: int, avg_graph_nodes: int = 30):
    """Block-diagonal-ish edge stream shaped like a REAL packed mega-batch
    (contiguous graphs of ~avg_graph_nodes nodes, intra-graph random edges,
    globally dst-sorted, padded with w=0 edges to the 1024 alignment) — the
    structure the one-hot/random microbench cannot represent but every
    production batch has."""
    src_l, dst_l = [], []
    base, budget = 0, num_edges
    while base < num_nodes and budget > 0:
        gn = max(4, int(rng.normal(avg_graph_nodes, avg_graph_nodes * 0.25)))
        gn = min(gn, num_nodes - base)
        ge = min(int(gn * num_edges / num_nodes), budget)
        if ge <= 0:
            break
        src_l.append(rng.integers(0, gn, ge) + base)
        dst_l.append(rng.integers(0, gn, ge) + base)
        base += gn
        budget -= ge
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    w = (rng.random(src.shape[0]).astype(np.float32) - 0.5) * 0.01
    pad = -len(src) % 1024
    if pad:
        src = np.r_[src, np.zeros(pad, np.int32)]
        dst = np.r_[dst, np.full(pad, num_nodes - 1, np.int32)]
        w = np.r_[w, np.zeros(pad, np.float32)]
    order = np.argsort(dst, kind="stable")
    return src[order], dst[order], w[order]


def spmm_microbench(
    num_nodes: int = 2048,
    num_features: int = 32,
    num_edges: int = 8192,
    impl: str = "xla",
    iters: int = 20,
    unroll: int = 16,
    reps: int = 4,
    seed: int = 0,
    structure_kind: str = "random",
) -> Dict[str, float]:
    """Isolated SpMM timing on realistic shapes.

    Methodology: a fori_loop iteration on this transport has a large
    fixed cost (~hundreds of µs — scheduling, not compute), so a naive
    one-op-per-iteration chain measures the harness, not the kernel.
    Here each iteration runs `unroll` dependency-chained ops, a trivial
    same-shape body measures the floor, and the per-op time is
    (iter_time − floor) / unroll. Each rep re-feeds perturbed inputs and
    fences with a value fetch (dispatch caching + async completion —
    see .claude/skills/verify/SKILL.md)."""
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.ops.spmm import spmm

    rng = np.random.default_rng(seed)
    if structure_kind == "batch":
        src_np, dst_np, w_np = _batch_edges(rng, num_nodes, num_edges)
        num_edges = src_np.shape[0]
    elif structure_kind == "random":
        src_np = rng.integers(0, num_nodes, num_edges).astype(np.int32)
        dst_np = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
        w_np = (rng.random(num_edges).astype(np.float32) - 0.5) * 0.01
    else:
        raise ValueError(f"unknown structure_kind {structure_kind!r}")
    src, dst, w = jnp.array(src_np), jnp.array(dst_np), jnp.array(w_np)
    h0 = rng.normal(size=(num_nodes, num_features)).astype(np.float32) * 0.01

    # block-pair structure (host-built once per batch in production —
    # setup cost here, like the dst-sort): lets the auto/pallas impls
    # route to the block-COO kernel (kernels/spmm_block_coo.py)
    structure = w_pad = w_padT = None
    if impl in ("auto", "pallas"):
        from dgcnn_tpu.kernels.spmm_block_coo import (
            build_block_coo,
            pad_weights,
            pad_weights_t,
        )

        structure = build_block_coo(src_np, dst_np, num_nodes)
        w_pad = jnp.asarray(pad_weights(structure, w_np))
        w_padT = jnp.asarray(pad_weights_t(structure, w_np))

    def time_chain(op, unroll_n):
        @jax.jit
        def chain(src, dst, w, h):
            def body(_, acc):
                for _ in range(unroll_n):
                    acc = op(src, dst, w, acc) * 0.5 + acc * 0.5
                return acc

            return jax.lax.fori_loop(0, iters, body, h).sum()

        float(chain(src, dst, w, jnp.array(h0)))  # compile
        times = []
        for r in range(reps):
            hr = jnp.array(h0 + r * 1e-4)
            t0 = time.perf_counter()
            float(chain(src, dst, w, hr))
            times.append(time.perf_counter() - t0)
        return min(times) / iters

    spmm_op = lambda s, d, ww, acc: spmm(
        s, d, ww, acc, num_nodes, impl=impl,
        structure=structure, w_pad=w_pad, w_padT=w_padT,
    )
    # adaptive unroll: a fast op (few µs) under a ~0.5 ms/iteration loop
    # floor leaves (full − floor) inside the floor's own noise band —
    # deepen the chain until the op signal dominates the iteration cost
    # (fixes NaN rows in bench detail once kernels dropped under ~10 µs)
    per_op = -1.0
    unroll_n = unroll
    clean_signal = False
    while unroll_n <= 128:
        floor = time_chain(lambda s, d, ww, acc: acc * 1.0001, unroll_n)
        full = time_chain(spmm_op, unroll_n)
        per_op = (full - floor) / unroll_n
        if full > floor * 1.5 and per_op > 0:
            clean_signal = True
            break
        unroll_n *= 4
    if per_op <= 0:
        # the kernel is below measurement noise at these shapes — report
        # that honestly instead of a clamped absurd throughput
        nan = float("nan")
        return {
            "impl": impl, "routed": impl, "structure": structure_kind,
            "num_nodes": num_nodes,
            "num_features": num_features, "num_edges": num_edges,
            "us_per_op": nan, "edges_per_s": nan,
            "achieved_gbps": nan, "pct_of_sol": nan,
            "below_measurement_floor": True,
        }
    routed = "onehot" if _is_onehot(impl, num_nodes, num_features,
                                    num_edges) else impl
    if structure is not None:
        from dgcnn_tpu.kernels.spmm_block_coo import block_coo_fits
        from dgcnn_tpu.ops.spmm import _BLOCK_COO_MIN_FILL

        if structure.meta.fill >= _BLOCK_COO_MIN_FILL and block_coo_fits(
            num_nodes, num_features, structure.ls.shape[0], structure.meta.eb
        ):
            routed = "blockcoo_pallas"

    bytes_moved = spmm_hbm_bytes(num_nodes, num_features, num_edges)
    return {
        "impl": impl,
        "routed": routed,
        "structure": structure_kind,
        "num_nodes": num_nodes,
        "num_features": num_features,
        "num_edges": num_edges,
        "us_per_op": per_op * 1e6,
        "edges_per_s": num_edges / per_op,
        "achieved_gbps": bytes_moved / per_op / 1e9,
        "pct_of_sol": pct_of_sol(bytes_moved, per_op),
        # the one-hot formulation's own roofline is the MXU, not HBM — it
        # trades bandwidth for 4·N·F USEFUL FLOPs per edge (ops/spmm.py).
        # Report useful-FLOP utilization (a lower bound: lane padding of
        # the F-wide operand is not counted as work) when the op actually
        # lowers to the one-hot matmuls; for the gather formulations the
        # ratio is meaningless and omitted
        **(
            {
                "mxu_tflops": (flops := 4.0 * num_nodes * num_features
                               * num_edges) / per_op / 1e12,
                "pct_of_mxu": flops / per_op / (V5E_MXU_BF16_TFLOPS * 1e12)
                * 100.0,
            }
            if routed == "onehot" else {}
        ),
        # the block-pair kernel is VMEM-resident and MXU-bound — its
        # honest roofline is also the MXU (2·BS²·(EB+F)/EB FLOPs per edge
        # slot, kernels/spmm_block_coo.py); SoL% would undersell a kernel
        # that barely touches HBM
        **(
            {
                "mxu_tflops": (bflops := 2.0 * structure.ls.shape[0] * 128
                               * (structure.meta.eb + num_features) * 128)
                / per_op / 1e12,
                "pct_of_mxu": bflops / per_op
                / (V5E_MXU_BF16_TFLOPS * 1e12) * 100.0,
            }
            if routed == "blockcoo_pallas" else {}
        ),
        # adaptive unroll exhausted at 128 without the op signal clearing
        # the 1.5× loop-iteration floor: per_op is positive but noisy —
        # flag it so consumers don't read a below-noise number as clean
        **({} if clean_signal else {"weak_signal": True}),
    }


def _is_onehot(impl: str, num_nodes: int, num_features: int,
               num_edges: int) -> bool:
    from dgcnn_tpu.ops.spmm import _ONEHOT_MAX_NF, ONEHOT_EDGE_BLOCK

    if num_edges % ONEHOT_EDGE_BLOCK:
        return False
    if impl == "onehot":
        return True
    return impl == "auto" and num_nodes * num_features <= _ONEHOT_MAX_NF
