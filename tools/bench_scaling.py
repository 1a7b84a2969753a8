#!/usr/bin/env python
"""Multi-chip edges/s scaling benchmark (SURVEY §2e / BASELINE target:
"edges/s scaling efficiency at 1 chip, 1 host and N≥2 hosts, ≥80%").

Runs the mesh-sharded device-COO training path (DP × edge-partitioned —
parallel/train_dp.py) at a series of mesh sizes over whatever devices are
available and reports training edges/s plus efficiency relative to the
1-device run, scaled per device.

On a real pod slice: run one process per host with
`dgcnn_tpu.parallel.initialize_multihost()` semantics (this script calls
it; give every host the same arguments) — collectives ride ICI within a
slice and DCN across hosts, both expressed by the same shard_map program.

On a single-chip or CPU machine: pass --force_cpu N to build an N-device
virtual CPU mesh; the numbers then validate scaling *mechanics* (the
program partitions, communicates, and stays numerically exact — see
tests/test_parallel.py), not hardware throughput.

    python tools/bench_scaling.py --force_cpu 8 --meshes 1,1 2,1 4,1 2,2 8,1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="NCI1")
    p.add_argument("--meshes", nargs="+", default=["1,1", "2,1", "4,1", "2,2", "8,1"],
                   help="data,graph mesh shapes to sweep")
    p.add_argument("--batch_size", default=50, type=int)
    p.add_argument("--epochs_per_dispatch", default=4, type=int)
    p.add_argument("--layout", default="coo", choices=["coo", "halo"],
                   help="mesh engine to sweep: replicated-node device-COO "
                        "(psum per layer) or halo node sharding (ppermute "
                        "boundary exchange; graph axis must be >1 to be "
                        "meaningful)")
    p.add_argument("--force_cpu", default=0, type=int, metavar="N",
                   help="use an N-device virtual CPU mesh (mechanics mode)")
    args = p.parse_args(argv)

    if args.force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.force_cpu}"
        ).strip()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from dgcnn_tpu.parallel import initialize_multihost

        initialize_multihost()

    import numpy as np
    import optax

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.train.cv import MeshDeviceCooEngine, MeshHaloEngine

    gs, meta = load_dataset(args.data_type, allow_download=False,
                            allow_synthetic=True)
    n_dev = len(jax.devices())
    print(f"# devices={n_dev} dataset={args.data_type} source={meta.source}",
          file=sys.stderr)

    rng = np.random.default_rng(324)
    perm = rng.permutation(gs.num_graphs)
    train_idx = perm[: int(gs.num_graphs * 0.9)]
    edges_per_epoch = float(gs.subset(train_idx).total_edges)

    results = {}
    for mesh_s in args.meshes:
        n_data, n_graph = (int(v) for v in mesh_s.split(","))
        if n_data * n_graph > n_dev:
            print(f"# skip mesh {mesh_s}: needs {n_data * n_graph} devices",
                  file=sys.stderr)
            continue
        cfg = Config(
            data_type=args.data_type,
            batch_size=args.batch_size,
            mesh_shape=(n_data, n_graph),
            layout=args.layout,
        )
        model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
        optimizer = optax.adam(1e-3)
        cls = MeshHaloEngine if args.layout == "halo" else MeshDeviceCooEngine
        engine = cls(cfg, gs, model, optimizer)
        engine.begin_fold(train_idx, train_idx[:1])  # minimal eval set

        params = init_params(jax.random.PRNGKey(0), model)
        opt_state = optimizer.init(params)
        key = jax.random.PRNGKey(1)
        shuffle = np.random.default_rng(7)

        def one(_):
            nonlocal params, opt_state, key
            perms = np.stack([
                shuffle.permutation(len(train_idx))
                for _ in range(args.epochs_per_dispatch)
            ])
            params, opt_state, key, rows = engine.run_epochs(
                params, opt_state, key, perms
            )
            return float(rows[:, 0].sum())

        one(-1)  # compile + warm
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            one(r)
            times.append(time.perf_counter() - t0)
        per_epoch = min(times) / args.epochs_per_dispatch
        results[mesh_s] = edges_per_epoch / per_epoch

    # baseline = the smallest mesh that actually ran; efficiency compares
    # per-device throughput against it
    ran = sorted(
        results, key=lambda m: int(np.prod([int(v) for v in m.split(",")]))
    )
    base_key = ran[0] if ran else None
    base_n = int(np.prod([int(v) for v in base_key.split(",")])) if ran else 1
    base = results.get(base_key) if ran else None
    out = []
    for mesh_s, eps in results.items():
        n = int(np.prod([int(v) for v in mesh_s.split(",")]))
        eff = (eps / n) / (base / base_n) * 100.0 if base else float("nan")
        out.append({
            "mesh": mesh_s,
            "devices": int(n),
            "edges_per_s": round(eps, 1),
            "scaling_efficiency_pct": round(eff, 1),
        })
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
