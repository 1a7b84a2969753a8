"""Headline benchmark: training-throughput edges/s on the NCI1 workload.

Protocol: full training epochs (forward + backward + Adam update, batch 50,
identical model/loss to the reference protocol) over the NCI1-profile
dataset; throughput = real graph edges consumed per wall-clock second.

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


def main():
    import jax
    import optax

    from dgcnn_tpu.batching import compute_bucket, pack_epoch
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.loop import make_train_epoch

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
    train_epoch = make_train_epoch(model, optimizer)

    bucket = compute_bucket(train, 50)
    batches = jax.device_put(pack_epoch(train, np.arange(train.num_graphs), 50, bucket))
    key = jax.random.PRNGKey(0)

    # self-loops are stripped at pack time; count the edges actually aggregated
    epoch_edges = float(np.asarray(batches.edge_mask).sum())

    # warm-up / compile
    params, opt_state, key, loss, _ = train_epoch(params, opt_state, key, batches)
    jax.block_until_ready(loss)

    reps, times = 5, []
    for _ in range(reps):
        t0 = time.perf_counter()
        params, opt_state, key, loss, _ = train_epoch(params, opt_state, key, batches)
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)

    best = min(times)
    edges_per_s = epoch_edges / best
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
    print(
        f"# data={meta.source} epoch_edges={epoch_edges:.0f} "
        f"epoch_time_best={best * 1e3:.1f}ms times_ms={[round(t * 1e3, 1) for t in times]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
