"""Golden-activation parity harness (SURVEY §4 item 2).

Dumps per-stage activations (gcn1..4, sort_pool, log_probs) for a fixed
(weights, batch) pair and compares two dumps allclose. Counterpart script
for the PyTorch/PyG side is parity/pyg_dump.py — run it in a pinned-PyG
environment on the same weights/graphs, then:

    python -m dgcnn_tpu.parity.harness dump --data_type MUTAG \
        --out ours.npz --weights w.npz [--synthetic]
    python -m dgcnn_tpu.parity.harness compare ours.npz pyg.npz
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np


def dump_activations(params, model, batch) -> Dict[str, np.ndarray]:
    """Run the framework forward, return per-stage activations restricted to
    real rows (node-padding and graph-padding stripped so dumps are
    layout-independent)."""
    import jax

    from dgcnn_tpu.models.dgcnn import apply

    lp, acts = apply(params, model, jax.device_put(batch), return_activations=True)
    n_real = int(np.asarray(batch.node_mask).sum())
    b_real = int(np.asarray(batch.num_graphs))
    out = {}
    for i in range(len(model.hidden_dims)):
        a = np.asarray(acts[f"gcn{i + 1}"])
        # dense layout: [B, n, C] → concat real rows; coo: [N, C]
        if a.ndim == 3:
            m = np.asarray(batch.node_mask) > 0
            a = a[m]
        else:
            a = a[:n_real]
        out[f"gcn{i + 1}"] = a
    out["sort_pool"] = np.asarray(acts["sort_pool"])[:b_real]
    out["log_probs"] = np.asarray(acts["log_probs"])[:b_real]
    return out


def compare_dumps(
    a: Dict[str, np.ndarray],
    b: Dict[str, np.ndarray],
    rtol: float = 1e-4,
    atol: float = 1e-5,
) -> Dict[str, float]:
    """Max abs deviation per stage; raises AssertionError on mismatch."""
    report = {}
    for key in sorted(set(a) & set(b)):
        x, y = np.asarray(a[key]), np.asarray(b[key])
        if x.shape != y.shape:
            raise AssertionError(f"{key}: shape {x.shape} vs {y.shape}")
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol, err_msg=key)
        report[key] = float(np.max(np.abs(x - y))) if x.size else 0.0
    missing = set(a) ^ set(b)
    if missing:
        raise AssertionError(f"stages only in one dump: {sorted(missing)}")
    return report


def _flat_save(path: str, params, model, dump: Dict[str, np.ndarray]):
    from dgcnn_tpu.parity.convert import params_to_torch_state

    arrays = {f"act_{k}": v for k, v in dump.items()}
    arrays.update(
        {f"w_{k}": v for k, v in params_to_torch_state(params, model).items()}
    )
    np.savez(path, **arrays)


def _load_acts(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k[4:]: z[k] for k in z.files if k.startswith("act_")}


def main(argv=None):
    p = argparse.ArgumentParser(description="activation parity harness")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump")
    d.add_argument("--data_type", default="MUTAG")
    d.add_argument("--out", required=True)
    d.add_argument("--num_graphs", type=int, default=50)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--synthetic", action="store_true")
    d.add_argument("--data_root", default="data")

    c = sub.add_parser("compare")
    c.add_argument("dump_a")
    c.add_argument("dump_b")
    c.add_argument("--rtol", type=float, default=1e-4)
    c.add_argument("--atol", type=float, default=1e-5)

    args = p.parse_args(argv)
    if args.cmd == "dump":
        import jax

        from dgcnn_tpu.batching import compute_bucket, pack_batch
        from dgcnn_tpu.data.datasets import load_dataset
        from dgcnn_tpu.models.dgcnn import DGCNN, init_params

        gs, meta = load_dataset(
            args.data_type, root=args.data_root,
            allow_download=False, allow_synthetic=args.synthetic,
        )
        model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
        params = init_params(jax.random.PRNGKey(args.seed), model)
        n = min(args.num_graphs, gs.num_graphs)
        batch = pack_batch(gs, np.arange(n), compute_bucket(gs, n))
        dump = dump_activations(params, model, batch)
        _flat_save(args.out, params, model, dump)
        print(f"wrote {args.out} (source={meta.source}, graphs={n})")
    else:
        report = compare_dumps(
            _load_acts(args.dump_a), _load_acts(args.dump_b),
            rtol=args.rtol, atol=args.atol,
        )
        for k, v in report.items():
            print(f"{k}: max_abs_dev={v:.3e}")
        print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
