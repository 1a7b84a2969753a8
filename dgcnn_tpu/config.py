"""Experiment configuration.

Mirrors the reference CLI surface (reference train.py:17-25: --data_type,
--batch_size=50, --num_epochs=100, --seed=324) and adds the TPU-build knobs
(mesh shape, bucket spec, kernel selection) that have no reference
counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

DATASETS = (
    "DD",
    "PTC_MR",
    "NCI1",
    "PROTEINS",
    "IMDB-BINARY",
    "IMDB-MULTI",
    "MUTAG",
    "COLLAB",
)


@dataclasses.dataclass(frozen=True)
class Config:
    """Full experiment configuration.

    The first four fields replicate the reference's user-facing flags and
    defaults (reference train.py:19-24); everything after is new, TPU-native
    surface.
    """

    # -- reference-parity flags (train.py:19-24) --
    data_type: str = "DD"
    batch_size: int = 50
    num_epochs: int = 100
    seed: int = 324

    # -- data --
    data_root: str = "data"
    # Directory containing {train,test}_idx-{fold}.txt files. If None, looks
    # under <data_root>/<data_type>/10fold_idx, then falls back to
    # deterministic stratified folds (see data/folds.py).
    fold_index_dir: Optional[str] = None
    use_node_attr: bool = True
    num_folds: int = 10

    # -- model (hardcoded in the reference model.py:13-23; configurable here) --
    hidden_dims: Tuple[int, ...] = (32, 32, 32, 1)
    sort_pool_k: int = 30
    # Original-paper alternative to a fixed k (the reference hardcodes 30,
    # model.py:17): pick k as the p-quantile of the dataset's node counts
    # so a fraction (1-p) of graphs get truncated — e.g. 0.6 reproduces the
    # paper's "k such that 60% of graphs have ≥ k nodes". Overrides
    # sort_pool_k when set; min 10, like muhanzhang/pytorch_DGCNN.
    sort_pool_percentile: Optional[float] = None
    conv1d_channels: Tuple[int, int] = (16, 32)
    conv1d_kernel: int = 5
    dense_dim: int = 128
    dropout_rate: float = 0.5

    # -- optimization (reference train.py:98-99: Adam all-default, NLL loss) --
    learning_rate: float = 1e-3
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    # Run the optimizer update on ONE raveled parameter vector instead of
    # per-leaf (train/flat_opt.py): bitwise-identical Adam math, ~13 small
    # per-leaf kernel chains collapse into one fused chain per step.
    # Changes the opt_state layout, so resume bundles are not
    # interchangeable between settings. Default off until the on-chip A/B
    # (tools/profile_step.py sgd/full rows) shows a win.
    opt_flatten: bool = False

    # -- TPU-native knobs (no reference counterpart) --
    # Batch layout: "dense" = per-graph dense normalized adjacency, GCN
    # propagation as batched MXU matmuls (fastest for small-graph datasets);
    # "block" = block-sparse 128×128 adjacency pool, propagation as batched
    # MXU matmuls over nonzero blocks (fastest when graphs are much smaller
    # than the dataset max, or large and sparse); "coo" = packed edge lists
    # + SpMM; "halo" = node axis SHARDED over the mesh "graph" axis with
    # ppermute boundary exchange per layer (parallel/halo.py — per-device
    # memory drops 1/n_graph; mesh-only); "auto" picks dense when the
    # largest graph and the stacked-epoch footprint allow it, EXCEPT the
    # COLLAB regime: when fold-lockstep can't engage and the single tile
    # is ≥2× the expected per-graph tile traffic, auto demotes to the
    # multi-tile ladder (train/cv.py choose_layout — on-chip 2026-08-19:
    # multi 20.5 ms vs dense 35.7 median COLLAB epoch).
    layout: str = "auto"
    dense_max_nodes: int = 2048
    # smallest tile of the multi-tile dense ladder (batching/multi_dense.py)
    multi_dense_min_tile: int = 256
    # device-HBM budget for the resident DenseDataset (v5e has 16 GB)
    dense_max_device_bytes: int = 8_000_000_000
    # COO aggregation kernel: "auto" = one-hot MXU matmul SpMM when the
    # node-block is small enough, else segment-sum; "xla" = jnp.take +
    # segment_sum; "onehot" = force the MXU formulation;
    # "pallas" = Pallas gather-scatter SpMM.
    spmm_impl: str = "auto"
    # Pad node/edge counts of a packed batch up to multiples of these.
    node_pad_multiple: int = 256
    edge_pad_multiple: int = 1024  # Pallas SpMM needs 1024-aligned edge streams
    graph_pad_multiple: int = 8
    # Compute dtype for the network ("float32" or "bfloat16"); params stay fp32.
    compute_dtype: str = "float32"
    # Storage dtype of device-resident normalized adjacencies (dense /
    # multi-tile / block layouts). The TPU MXU's DEFAULT matmul precision
    # already rounds fp32 operands to bfloat16 before multiplying, so
    # storing the adjacency pre-rounded halves its HBM traffic without
    # changing what the MXU computes; "auto" = bfloat16 on TPU, float32
    # elsewhere (CPU matmuls really consume fp32). Adjacency VALUES are
    # built in fp32 (degree math) and only stored rounded. Default "auto":
    # the on-chip probe (tools/probe_mxu_rounding.py, 2026-08-19 v5e run)
    # measured BITWISE-equal products for bf16-stored vs fp32-stored
    # operands at DEFAULT precision, and the DD block anatomy
    # (tools/profile_block_step.py) measured the full step 24% faster
    # (1344 vs 1763 µs over floor) with the halved block stream.
    adj_dtype: str = "auto"
    # Block-sparse propagation implementation (--layout block):
    # "xla" = batched einsum over gathered [W, bs, bs] blocks + sorted
    # segment-sum; "pallas" = fused CSR-style kernel streaming pool blocks
    # HBM→VMEM per work item (kernels/block_pallas.py) — no gathered-block
    # or parts materialization. "auto" currently resolves to "xla"
    # (flip pending on-chip profile_block_step.py A/B). Same MXU math and
    # fp32 accumulation; per-row accumulation ORDER differs from XLA's
    # segment-sum tree, so equality is pinned to 1e-6 (not bitwise) in
    # tests/test_block_pallas.py.
    block_impl: str = "auto"
    # Dense-layout GCN trunk: "xla" einsum chain vs "fused" VMEM-resident
    # Pallas kernel (kernels/dense_trunk.py — one adjacency read per
    # direction instead of four). "auto" resolves per measurement
    # (resolved_dense_trunk). TPU + fp32-compute only; other
    # configurations fall back to the einsum chain inside the model.
    dense_trunk: str = "auto"
    # Cross-validation execution: "folds" trains all K folds in LOCKSTEP
    # via vmap over a fold axis (near-K× throughput on small datasets —
    # per-fold protocol and metrics are unchanged, see train/cv_vmap.py);
    # "sequential" runs folds one at a time; "auto" picks lockstep for the
    # single-chip dense layout. Checkpoint/resume works in lockstep too:
    # one stacked inflight bundle advances every fold together
    # (train/cv_vmap.py) — folds can't pause individually, so a resume
    # continues the whole run from the last chunk boundary.
    cv_parallel: str = "auto"
    # auto-lockstep gate: train folds in lockstep only while the stacked
    # per-step dense working set (folds × slots × n_tile × (n_tile + F) ×
    # 4 B) stays under this. Small datasets are per-step-overhead-bound
    # (lockstep wins, e.g. NCI1 9.5→6.4 ms/fold-epoch); big dense
    # datasets like COLLAB are bandwidth-bound and lockstep merely
    # multiplies traffic (29→96 ms/fold-epoch — measured). 128 MB after
    # the 2026-08-19 PROTEINS A/B: its ~72 MB stack sat just over the old
    # 64 MB cap, but 100-epoch steady state measured lockstep 3.13
    # ms/fold-epoch vs sequential dense 3.8 (judge such A/Bs on ≥100
    # epochs — a run whose folds fit one fused dispatch reads one-time
    # program-load cost into epoch_seconds). COLLAB's ~484 MB stack stays
    # far above the cap either way.
    lockstep_max_step_bytes: int = 128 << 20
    # Upper bound on epochs fused into ONE device program dispatch. Fusion
    # amortizes the ~tens-of-ms dispatch latency, but an unbounded fold
    # (100 epochs of a big dataset) becomes a multi-minute single dispatch
    # — long enough to trip remote-worker RPC deadlines, and it defers
    # metrics/checkpoints. 25 keeps dispatches in the seconds range.
    max_fused_epochs: int = 25
    # COO batch assembly: "device" keeps the flattened graphset in HBM and
    # assembles batches inside jit (one index-matrix transfer per epoch,
    # like the dense path); "host" packs on the host (CPU/debug fallback).
    coo_assembly: str = "device"
    # Host-COO epoch-fusion transfer budget: how many bytes of host-packed
    # epochs to ship per fused multi-epoch dispatch (device-resident
    # layouts need no budget — only index matrices transfer).
    coo_fuse_bytes: int = 1 << 30
    # Device mesh: (data, graph) axis sizes. (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)

    # Persistent XLA compilation cache directory ("" = disabled — the
    # default). On the remote-attached TPU platform this cache is a pure
    # loss: enabling it adds a measured ~11 MINUTES of one-time
    # per-process overhead to the first program lowering, and cache
    # "hits" still pay a full compile on executable load through the
    # transport. Opt in only on hardware where jax's persistent cache is
    # known to work.
    xla_cache_dir: str = ""

    # -- artifacts (reference train.py:129-131, 144-145) --
    epochs_dir: str = "epochs"
    statistics_dir: str = "statistics"
    checkpoint_resume: bool = False
    # save an in-flight (params, opt_state, rng, epoch, metrics) bundle
    # every N epochs so --resume restarts mid-fold; 0 = fold-level only
    checkpoint_every: int = 0
    log_every: int = 0  # epochs between stdout metric lines; 0 = silent
    # export the run's event stream as TensorBoard event files into this
    # directory at run end (None = skip; see train/tensorboard.py)
    tensorboard_dir: Optional[str] = None

    def resolved_block_impl(self) -> str:
        """Concrete block propagation impl. "auto" → "xla": the on-chip
        A/B (tools/profile_block_step.py DD anatomies, 2026-08-19 v5e run)
        measured the fused CSR-style kernel LOSING to the XLA formulation
        — fwd 712 vs 440 µs, full step 2876 vs 1763 µs over floor — its
        per-item HBM→VMEM DMA round-trips are latency-bound at 128×128
        block granularity. The kernel stays available (--block_impl
        pallas) and correct; the VMEM-resident block-pair COO kernel
        (kernels/spmm_block_coo.py) is the Pallas path that wins instead."""
        if self.block_impl != "auto":
            return self.block_impl
        return "xla"

    def resolved_dense_trunk(self) -> str:
        """Concrete dense-trunk impl. "auto" → "xla": the 2026-08-21
        on-chip A/B (tools/probe_dense_trunk.py, full fused-epoch step
        context) measured the VMEM-resident Pallas trunk LOSING ~2× on
        both dense-layout defaults — COLLAB multi 23.61 vs 11.95 ms,
        NCI1 single-fold dense 10.07 vs 4.97 ms — despite its 4×
        adjacency-read reduction (plausibly the custom-VJP fusion
        boundary around the trunk; not root-caused). The kernel stays
        available (--dense_trunk fused) and
        interpret-mode-exact; the fused kernel's own gates (TPU backend,
        fp32 compute) apply inside the model either way."""
        if self.dense_trunk != "auto":
            return self.dense_trunk
        return "xla"

    def resolved_adj_dtype(self) -> str:
        """Concrete adjacency storage dtype ("auto" → backend-dependent:
        bfloat16 where the MXU's DEFAULT-precision operand rounding makes
        it free, float32 on CPU where matmuls consume full fp32)."""
        if self.adj_dtype != "auto":
            return self.adj_dtype
        import jax

        # canonical backend check (ops/spmm.py, models/dgcnn.py): the
        # remote-attached TPU registers as backend "axon", and its
        # device_kind string is not guaranteed to contain "tpu"
        on_tpu = jax.default_backend() in ("tpu", "axon")
        return "bfloat16" if on_tpu else "float32"

    def __post_init__(self):
        if self.data_type not in DATASETS:
            raise ValueError(
                f"unknown data_type {self.data_type!r}; expected one of {DATASETS}"
            )
        if self.spmm_impl not in ("auto", "xla", "onehot", "pallas"):
            raise ValueError(f"unknown spmm_impl {self.spmm_impl!r}")
        if (
            len(self.mesh_shape) != 2
            or any(int(d) < 1 for d in self.mesh_shape)
        ):
            raise ValueError(
                f"mesh_shape must be two positive ints (data, graph); got "
                f"{self.mesh_shape!r}"
            )
        if self.layout not in ("auto", "coo", "dense", "multi", "block",
                               "halo"):
            raise ValueError(f"unknown layout {self.layout!r}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown compute_dtype {self.compute_dtype!r}")
        if self.adj_dtype not in ("auto", "float32", "bfloat16"):
            raise ValueError(f"unknown adj_dtype {self.adj_dtype!r}")
        if self.block_impl not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown block_impl {self.block_impl!r}")
        if self.coo_assembly not in ("device", "host"):
            raise ValueError(f"unknown coo_assembly {self.coo_assembly!r}")
        if int(self.multi_dense_min_tile) < 8:
            raise ValueError(
                f"multi_dense_min_tile must be ≥8 (sublane-aligned tile); "
                f"got {self.multi_dense_min_tile!r}"
            )
        if self.cv_parallel not in ("auto", "folds", "sequential"):
            raise ValueError(f"unknown cv_parallel {self.cv_parallel!r}")
        if self.dense_trunk not in ("auto", "xla", "fused"):
            raise ValueError(f"unknown dense_trunk {self.dense_trunk!r}")
        if self.sort_pool_percentile is not None and not (
            0.0 < self.sort_pool_percentile <= 1.0
        ):
            raise ValueError(
                f"sort_pool_percentile must be a fraction in (0, 1], got "
                f"{self.sort_pool_percentile!r}"
            )
