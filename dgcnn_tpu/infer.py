"""Inference: load a trained fold checkpoint and classify graphs.

A serving surface the reference does not have (it saves weights it never
loads — reference train.py:129): batch prediction over a GraphSet as one
jitted scan (single dispatch), returning per-graph log-probabilities and
labels in dataset order.

    python -m dgcnn_tpu.infer --data_type MUTAG --checkpoint epochs/MUTAG_1 \
        --out predictions.csv [--synthetic]
"""

from __future__ import annotations

import argparse
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.batching.dense import order_matrix
from dgcnn_tpu.batching.device_coo import build_device_graphset, gather_coo_batch
from dgcnn_tpu.batching.packer import compute_bucket
from dgcnn_tpu.data.graphset import GraphSet
from dgcnn_tpu.models.dgcnn import DGCNN, Params, apply, init_params
from dgcnn_tpu.utils.checkpoint import load_checkpoint


def predict_dataset(
    params: Params,
    model: DGCNN,
    dataset: GraphSet,
    batch_size: int = 50,
    spmm_impl: str = "xla",
) -> Tuple[np.ndarray, np.ndarray]:
    """Classify every graph. Returns (log_probs [G, C], labels [G]) in
    dataset order. Runs as one fused device program over the
    device-resident COO layout (works for every dataset size)."""
    dev = jax.device_put(build_device_graphset(dataset))
    bucket = compute_bucket(dataset, batch_size)
    order2d = order_matrix(
        np.arange(dataset.num_graphs, dtype=np.int32), batch_size,
        bucket.num_graphs,
    )

    @jax.jit
    def run(params, dev, order2d):
        def body(carry, idx_row):
            batch = gather_coo_batch(dev, idx_row, bucket)
            lp = apply(
                params, model, batch, deterministic=True, spmm_impl=spmm_impl
            )
            return carry, lp

        _, lps = jax.lax.scan(body, None, order2d)
        return lps  # [steps, slots, C]

    lps = np.asarray(jax.device_get(run(params, dev, order2d)))
    flat = lps.reshape(-1, lps.shape[-1])[: len(order2d.reshape(-1))]
    keep = order2d.reshape(-1) >= 0
    out = np.empty((dataset.num_graphs, lps.shape[-1]), np.float32)
    out[order2d.reshape(-1)[keep]] = flat[keep]
    return out, out.argmax(axis=-1)


def load_fold_params(checkpoint: str, model: DGCNN) -> Params:
    """Load `params` from a fold checkpoint bundle written by the CV driver
    (`epochs/<type>_<fold>`); accepts both final bundles (params,
    opt_state) and raw params bundles."""
    import optax

    from dgcnn_tpu.train.flat_opt import flatten_optimizer

    like_params = init_params(jax.random.PRNGKey(0), model)
    donors = [
        {"params": like_params, "opt_state": optax.adam(1e-3).init(like_params)},
        # --opt_flatten runs carry a raveled-vector Adam state
        {"params": like_params,
         "opt_state": flatten_optimizer(optax.adam(1e-3)).init(like_params)},
        like_params,  # raw params bundle
    ]
    err = None
    for like in donors:
        try:
            out = load_checkpoint(checkpoint, like)
        except (KeyError, ValueError) as e:
            err = e
            continue
        return out["params"] if isinstance(out, dict) and "params" in out else out
    raise err


def main(argv=None):
    from dgcnn_tpu.config import DATASETS
    from dgcnn_tpu.data.datasets import load_dataset

    p = argparse.ArgumentParser(description="DGCNN batch inference")
    p.add_argument("--data_type", required=True, choices=list(DATASETS))
    p.add_argument("--checkpoint", required=True,
                   help="fold checkpoint path WITHOUT .npz suffix, e.g. "
                        "epochs/MUTAG_1")
    p.add_argument("--data_root", default="data")
    p.add_argument("--batch_size", default=50, type=int)
    p.add_argument("--out", default=None, help="CSV of per-graph predictions")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "probe"],
                   help="JAX platform pin; 'probe' health-checks the "
                        "accelerator and falls back to CPU if it hangs "
                        "(utils/platform.py) — a serving process must "
                        "degrade, not stall")
    args = p.parse_args(argv)

    from dgcnn_tpu.utils.platform import resolve_platform

    pin = resolve_platform(args.platform)
    if pin:
        import jax

        jax.config.update("jax_platforms", pin)

    gs, meta = load_dataset(
        args.data_type, root=args.data_root, allow_synthetic=args.synthetic
    )
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = load_fold_params(args.checkpoint, model)
    log_probs, labels = predict_dataset(params, model, gs, args.batch_size)

    acc = float((labels == gs.y).mean()) * 100.0
    print(f"predicted {gs.num_graphs} graphs (source={meta.source}); "
          f"accuracy vs dataset labels: {acc:.2f}%")
    if args.out:
        conf = np.exp(log_probs.max(axis=-1))
        with open(args.out, "w") as f:
            f.write("graph,predicted_label,confidence,true_label\n")
            for i, (lab, c, y) in enumerate(zip(labels, conf, gs.y)):
                f.write(f"{i},{lab},{c:.4f},{y}\n")
        print(f"wrote {args.out}")
    return labels


if __name__ == "__main__":
    main()
