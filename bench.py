"""Headline benchmark: training-throughput edges/s on the NCI1 workload.

Protocol: full training epochs (forward + backward + Adam update, batch 50,
identical model/loss to the reference protocol) over the NCI1-profile
dataset; throughput = real graph edges consumed per wall-clock second.

Three aggregation paths are measured — dense MXU adjacency blocks (the
TPU-native layout, default for small-graph datasets), XLA COO SpMM, and the
Pallas gather-scatter COO kernel — and the framework-default (dense) is
the headline.

Baseline: the reference publishes 61.04 s per NCI1 training epoch on a GTX
1070 (reference README.md:128-138; mirrored in BASELINE.md). It publishes
no throughput numbers, so the edges/s baseline is *derived* (BASELINE.md
note): the same epoch's edge count divided by the published time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_epochs(run_one_epoch, reps=5):
    """`run_one_epoch(rep) -> jax value`; times each rep after a warm-up.
    Callers vary their inputs per rep — repeated identical dispatches can be
    cached by the device transport and report fantasy numbers."""
    import jax

    jax.block_until_ready(run_one_epoch(-1))  # warm-up / compile
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run_one_epoch(r))
        times.append(time.perf_counter() - t0)
    return min(times), times


def main():
    import jax
    import optax

    from dgcnn_tpu.batching import compute_bucket, pack_epoch
    from dgcnn_tpu.batching.dense import (
        build_dense_dataset,
        dense_tile,
        order_matrix,
    )
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.loop import make_dense_gather_epochs, make_train_epoch

    # real data when present under data/, synthetic NCI1 profile otherwise
    gs, meta = load_dataset("NCI1", allow_download=False, allow_synthetic=True)

    # fold-1-style 90% train split, like one CV fold (train.py:103-109)
    rng = np.random.default_rng(324)
    perm = rng.permutation(gs.num_graphs)
    train = gs.subset(perm[: int(gs.num_graphs * 0.9)])

    model = DGCNN(num_features=train.num_features, num_classes=train.num_classes)
    params = init_params(jax.random.PRNGKey(324), model)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    order = np.arange(train.num_graphs)

    # epoch edge count: self-loops are stripped at pack time; every real
    # (directed) edge is aggregated once per epoch per GCN stack pass.
    bucket = compute_bucket(train, 50)
    coo_batches = jax.device_put(pack_epoch(train, order, 50, bucket))
    epoch_edges = float(np.asarray(coo_batches.edge_mask).sum())
    shuffle = np.random.default_rng(7)

    results = {}

    # headline path: device-resident dense dataset, on-device batch gather —
    # exactly what the CV driver runs for NCI1 (train/cv.py DenseEngine).
    data = jax.device_put(build_dense_dataset(train, dense_tile(train)))
    dense_train, _ = make_dense_gather_epochs(model, optimizer)
    state = {"p": params, "s": opt_state, "k": jax.random.PRNGKey(0)}

    def dense_epoch(_):
        order2d = order_matrix(shuffle.permutation(train.num_graphs), 50, 56)
        state["p"], state["s"], state["k"], loss, _ = dense_train(
            state["p"], state["s"], state["k"], data, order2d
        )
        return loss

    results["dense_gather"] = _time_epochs(dense_epoch)

    for impl in ("xla", "pallas"):
        coo_train = make_train_epoch(model, optimizer, spmm_impl=impl)
        st = {"p": params, "s": opt_state, "k": jax.random.PRNGKey(0)}

        def coo_epoch(_):
            st["p"], st["s"], st["k"], loss, _ = coo_train(
                st["p"], st["s"], st["k"], coo_batches
            )
            return loss

        results[f"coo_{impl}"] = _time_epochs(coo_epoch)

    headline = results["dense_gather"][0]
    edges_per_s = epoch_edges / headline
    # derived GTX-1070 baseline: same epoch's edges / published 61.04 s
    baseline = epoch_edges / 61.04

    print(
        json.dumps(
            {
                "metric": "train_edges_per_s_per_chip_nci1",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / baseline, 2),
            }
        )
    )
    detail = {
        k: {
            "epoch_ms": round(v[0] * 1e3, 2),
            "edges_per_s": round(epoch_edges / v[0], 1),
        }
        for k, v in results.items()
    }
    print(
        f"# data={meta.source} epoch_edges={epoch_edges:.0f} paths={json.dumps(detail)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
