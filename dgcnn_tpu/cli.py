"""Command-line interface.

Keeps the reference's four user-facing flags with identical names, choices,
and defaults (reference train.py:17-25) and adds the TPU-build knobs.

    python -m dgcnn_tpu.cli --data_type MUTAG
"""

from __future__ import annotations

import argparse
import os

from dgcnn_tpu.config import DATASETS, Config
from dgcnn_tpu.train.cv import run_cross_validation


def get_args(argv=None):
    parser = argparse.ArgumentParser(description="Train Model")
    # reference-parity flags (train.py:19-24)
    parser.add_argument("--data_type", default="DD", type=str, choices=list(DATASETS),
                        help="dataset type")
    parser.add_argument("--batch_size", default=50, type=int, help="train batch size")
    parser.add_argument("--num_epochs", default=100, type=int, help="train epochs number")
    parser.add_argument("--seed", default=324, type=int, help="random seed")
    # TPU-build flags
    parser.add_argument("--data_root", default="data", type=str,
                        help="dataset root directory")
    parser.add_argument("--fold_dir", default=None, type=str,
                        help="directory with {train,test}_idx-<k>.txt fold files")
    parser.add_argument("--layout", default="auto",
                        choices=["auto", "coo", "dense", "multi", "block",
                                 "halo"],
                        help="batch layout: dense MXU adjacency blocks, "
                             "size-bucketed multi-tile dense, block-sparse "
                             "128x128 adjacency pool, COO+SpMM, or halo "
                             "(node axis SHARDED over the mesh graph axis, "
                             "ppermute boundary exchange — needs --mesh)")
    parser.add_argument("--mesh", default="1,1", type=str,
                        help="device mesh 'data,graph' (e.g. 4,2 = 4-way data "
                             "parallel x 2-way edge-partitioned)")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize the multi-host runtime "
                             "(jax.distributed) before first device touch — "
                             "required on TPU pods; coordinator/process "
                             "topology auto-detects from the TPU environment "
                             "or from the flags below")
    parser.add_argument("--coordinator", default=None, type=str,
                        help="multi-host coordinator address host:port "
                             "(omit on TPU pods — auto-detected)")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="multi-host process count (omit to auto-detect)")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this process's multi-host rank (omit to "
                             "auto-detect)")
    # model/optimizer hyperparameters (hardcoded in the reference
    # model.py:13-23 / train.py:98-99; configurable like the original
    # muhanzhang/pytorch_DGCNN implementation — defaults reproduce the
    # reference exactly)
    parser.add_argument("--lr", default=1e-3, type=float,
                        help="Adam learning rate (reference: optax/torch "
                             "default 1e-3)")
    parser.add_argument("--sortpool_k", default=30, type=int,
                        help="SortPooling k — nodes kept per graph "
                             "(reference hardcodes 30; overridden by "
                             "--sortpool_percentile)")
    parser.add_argument("--hidden_dims", default="32,32,32,1", type=str,
                        help="comma-separated GCN layer widths (reference: "
                             "32,32,32,1 — the final 1-wide layer feeds the "
                             "sort key)")
    parser.add_argument("--dense_dim", default=128, type=int,
                        help="width of the penultimate dense layer "
                             "(reference: 128)")
    parser.add_argument("--dropout", default=0.5, type=float,
                        help="dropout rate before the classifier "
                             "(reference: 0.5)")
    parser.add_argument("--num_folds", default=10, type=int,
                        help="cross-validation fold count (reference "
                             "protocol: 10)")
    parser.add_argument("--spmm", default="auto",
                        choices=["auto", "xla", "onehot", "pallas"],
                        help="COO SpMM kernel implementation")
    parser.add_argument("--sortpool_percentile", default=None, type=float,
                        help="pick SortPooling k as this quantile of graph "
                             "sizes (original-paper semantics, e.g. 0.6); "
                             "default keeps the reference's fixed k=30")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute dtype for matmuls/convs (fp32 "
                             "accumulation; params and loss stay fp32)")
    parser.add_argument("--adj_dtype", default="auto",
                        choices=["auto", "float32", "bfloat16"],
                        help="STORAGE dtype of device-resident dense "
                             "adjacencies (bf16 halves their HBM traffic "
                             "and is bitwise-identical under the MXU's "
                             "DEFAULT-precision rounding — measured on-chip; "
                             "auto = bf16 on TPU, fp32 on CPU)")
    parser.add_argument("--block_impl", default="auto",
                        choices=["auto", "xla", "pallas"],
                        help="block-sparse propagation impl: xla = batched "
                             "einsum + sorted segment-sum; pallas = fused "
                             "CSR-style kernel (kernels/block_pallas.py); "
                             "same math, equality pinned to 1e-6 in tests")
    parser.add_argument("--dense_trunk", default="auto",
                        choices=["auto", "xla", "fused"],
                        help="dense-layout GCN trunk: xla = einsum chain; "
                             "fused = VMEM-resident Pallas kernel (one "
                             "adjacency read per direction instead of four "
                             "— kernels/dense_trunk.py; TPU+fp32 only)")
    parser.add_argument("--multi_min_tile", type=int, default=256,
                        help="smallest tile of the multi-tile dense "
                             "geometric ladder (--layout multi; "
                             "batching/multi_dense.py plan_tiles)")
    parser.add_argument("--opt_flatten", action="store_true",
                        help="run the Adam update on one raveled parameter "
                             "vector (bitwise-identical math, one fused "
                             "elementwise chain instead of ~13 per-leaf "
                             "kernel chains per step; resume bundles are "
                             "not interchangeable with the default)")
    parser.add_argument("--synthetic", action="store_true",
                        help="allow fallback to synthetic profile data when the "
                             "real dataset is unavailable offline")
    parser.add_argument("--resume", action="store_true",
                        help="resume a partially completed 10-fold run")
    parser.add_argument("--ckpt_every", default=0, type=int,
                        help="save an in-flight resume bundle every N epochs")
    parser.add_argument("--log_every", default=0, type=int,
                        help="print metrics every N epochs (0 = per-fold only)")
    parser.add_argument("--out_root", default=None, type=str, metavar="DIR",
                        help="write artifacts under DIR/statistics and "
                             "DIR/epochs instead of ./statistics and "
                             "./epochs (e.g. to byte-compare two runs "
                             "with tools/diff_runs.py)")
    parser.add_argument("--tensorboard", default=None, type=str, metavar="DIR",
                        help="export per-fold metric curves as TensorBoard "
                             "event files into DIR at run end (the visdom "
                             "replacement; also available post-hoc via "
                             "tools/export_tensorboard.py)")
    parser.add_argument("--profile", default=None, type=str, metavar="DIR",
                        help="capture a jax.profiler device trace of the run "
                             "into DIR (view with TensorBoard/xprof)")
    parser.add_argument("--platform", default="auto",
                        choices=["auto", "cpu", "probe"],
                        help="JAX platform pin (the capability-equivalent of "
                             "the reference's cuda->mps->cpu fallback, "
                             "reference train.py:75-79): 'cpu' keeps the run "
                             "alive when the accelerator is unreachable; "
                             "'auto' uses JAX's default backend resolution; "
                             "'probe' health-checks the accelerator with a "
                             "subprocess dispatch first and falls back to "
                             "CPU if it hangs (remote TPU transports can "
                             "wedge without raising — utils/platform.py)")
    return parser.parse_args(argv)


def main(argv=None):
    opt = get_args(argv)
    if opt.multihost or os.environ.get("DGCNN_MULTIHOST"):
        # SURVEY §2e item 3: pod runs must bring up the distributed
        # runtime BEFORE any backend touch (resolve_platform below probes
        # devices). Auto-detects pod topology when the explicit flags are
        # omitted; on failure this raises rather than silently training
        # independent per-host replicas (parallel/mesh.py).
        from dgcnn_tpu.parallel.mesh import initialize_multihost

        kwargs = {}
        if opt.coordinator:
            kwargs["coordinator_address"] = opt.coordinator
        if opt.num_processes is not None:
            kwargs["num_processes"] = opt.num_processes
        if opt.process_id is not None:
            kwargs["process_id"] = opt.process_id
        initialize_multihost(**kwargs)
    from dgcnn_tpu.utils.platform import resolve_platform

    pin = resolve_platform(opt.platform)
    if pin:
        # must land before the first backend touch; an env var alone is
        # not enough on hosts whose sitecustomize force-pins a platform
        import jax

        jax.config.update("jax_platforms", pin)
    import contextlib

    ctx = contextlib.nullcontext()
    if opt.profile:
        from dgcnn_tpu.utils.profiling import trace

        ctx = trace(opt.profile)
    cfg = Config(
        data_type=opt.data_type,
        batch_size=opt.batch_size,
        num_epochs=opt.num_epochs,
        seed=opt.seed,
        data_root=opt.data_root,
        fold_index_dir=opt.fold_dir,
        layout=opt.layout,
        mesh_shape=tuple(int(v) for v in opt.mesh.split(",")),
        spmm_impl=opt.spmm,
        compute_dtype=opt.dtype,
        adj_dtype=opt.adj_dtype,
        block_impl=opt.block_impl,
        dense_trunk=opt.dense_trunk,
        multi_dense_min_tile=opt.multi_min_tile,
        learning_rate=opt.lr,
        sort_pool_k=opt.sortpool_k,
        hidden_dims=tuple(int(v) for v in opt.hidden_dims.split(",")),
        dense_dim=opt.dense_dim,
        dropout_rate=opt.dropout,
        num_folds=opt.num_folds,
        sort_pool_percentile=opt.sortpool_percentile,
        opt_flatten=opt.opt_flatten,
        checkpoint_resume=opt.resume,
        checkpoint_every=opt.ckpt_every,
        log_every=opt.log_every,
        tensorboard_dir=opt.tensorboard,
        **(
            {
                "epochs_dir": os.path.join(opt.out_root, "epochs"),
                "statistics_dir": os.path.join(opt.out_root, "statistics"),
            }
            if opt.out_root else {}
        ),
    )
    with ctx:
        return run_cross_validation(cfg, allow_synthetic=opt.synthetic)


if __name__ == "__main__":
    main()
