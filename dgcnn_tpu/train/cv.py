"""10-fold cross-validation driver.

Reproduces the reference experiment protocol (reference train.py:69-148):
for each fold 1..10 — fresh model + Adam(defaults), vendored fold indices,
shuffled train batches of `batch_size`, 100 epochs of train+test, per-fold
CSV + checkpoint, and finally an overall CSV plus a printed
"mean±std of last-epoch accuracy across folds" line (train.py:144-148).

TPU-native differences (behavior-preserving at the protocol level):
  * each epoch is one jitted `lax.scan` program over pre-packed,
    fixed-shape batches — no per-batch host sync (SURVEY §3.2);
  * batches are packed into a per-dataset worst-case bucket, so XLA
    compiles the step exactly once per fold shape;
  * checkpoints are full `(params, opt_state)` bundles with a resume path
    (the reference saves weights it never loads — train.py:129);
  * the RNG is explicitly keyed per fold (the reference seeds once globally,
    so its fold k depends on folds 1..k-1 having run — SURVEY §4; explicit
    keys give the stronger property of per-fold reproducibility).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Optional, Tuple

import jax
import numpy as np
import optax

from dgcnn_tpu.batching.dense import (
    build_dense_dataset_on_device,
    dense_dataset_bytes,
    dense_tile,
    order_matrix,
)
from dgcnn_tpu.batching.packer import compute_bucket, pack_epoch
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.datasets import load_dataset
from dgcnn_tpu.data.folds import get_folds
from dgcnn_tpu.data.graphset import GraphSet
from dgcnn_tpu.models.dgcnn import DGCNN, init_params, num_params
from dgcnn_tpu.train.loop import (
    make_coo_run,
    make_dense_gather_epochs,
    make_dense_gather_run,
    make_eval_epoch,
    make_train_epoch,
)
from dgcnn_tpu.train.cv_vmap import fold_shard_devices
from dgcnn_tpu.train.metrics import EventLog, FoldMetrics, write_overall_csv
from dgcnn_tpu.utils.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)


def percentile_sort_pool_k(node_counts: np.ndarray, percentile: float) -> int:
    """Original-paper k selection: the `percentile`-quantile of graph
    sizes (ascending), floored at 10 — so ~(1-p) of graphs are truncated
    by SortPooling. Mirrors muhanzhang/pytorch_DGCNN's sortpooling_k."""
    sizes = np.sort(np.asarray(node_counts))
    idx = max(0, int(np.ceil(percentile * len(sizes))) - 1)
    return max(10, int(sizes[idx]))


def _model_from_config(
    cfg: Config, num_features: int, num_classes: int,
    node_counts: Optional[np.ndarray] = None,
) -> DGCNN:
    k = cfg.sort_pool_k
    if cfg.sort_pool_percentile is not None:
        if node_counts is None:
            raise ValueError("sort_pool_percentile needs dataset node counts")
        k = percentile_sort_pool_k(node_counts, cfg.sort_pool_percentile)
        print(f"sort_pool_k={k} ({cfg.sort_pool_percentile:.0%} percentile)")
    return DGCNN(
        num_features=num_features,
        num_classes=num_classes,
        hidden_dims=cfg.hidden_dims,
        sort_pool_k=k,
        conv1d_channels=cfg.conv1d_channels,
        conv1d_kernel=cfg.conv1d_kernel,
        dense_dim=cfg.dense_dim,
        dropout_rate=cfg.dropout_rate,
        compute_dtype=cfg.compute_dtype,
        dense_trunk=cfg.resolved_dense_trunk(),
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lockstep_would_engage(cfg: Config, dataset: GraphSet, n_tile: int) -> bool:
    """Whether the fold-lockstep vmap driver (train/cv_vmap.py) will run
    this dataset on the DENSE layout — mirrors the `use_lockstep`
    decision in run_cross_validation so choose_layout can account for it
    (lockstep is near-K× faster, so a dataset that locksteps should
    never be demoted off the dense layout).

    A (D, 1) mesh whose D divides the fold count runs lockstep
    fold-SHARDED (cv_vmap.fold_shard_devices — the SCALING.md pod
    recipe); the stacked step is split D ways, so the byte budget
    scales with D."""
    if cfg.cv_parallel == "folds":
        return True  # explicit request: lockstep runs (dense/block only)
    if cfg.cv_parallel != "auto":
        return False
    d = fold_shard_devices(cfg.mesh_shape, cfg.num_folds)
    if d is None:
        return False
    slots = _round_up(cfg.batch_size, cfg.graph_pad_multiple)
    step_bytes = (
        cfg.num_folds
        * slots
        * n_tile
        * (n_tile + dataset.num_features)
        * 4
    )
    return step_bytes <= cfg.lockstep_max_step_bytes * d


def _batched_lockstep_would_engage(cfg: Config) -> bool:
    """Whether the BLOCK or MULTI layouts run fold-lockstep (VERDICT r3
    #1): their fold-batched forms amortize per-op issue overhead K× (the
    multi step is ~95% fixed overhead at COLLAB scale — measured
    2026-08-20). Engages under auto whenever the mesh is
    fold-compatible; both layouts' batches scale with graph structure
    (not max-tile²), so no byte gate is needed at these model sizes."""
    if cfg.cv_parallel == "folds":
        return True
    if cfg.cv_parallel != "auto":
        return False
    return fold_shard_devices(cfg.mesh_shape, cfg.num_folds) is not None


def choose_layout(cfg: Config, dataset: GraphSet) -> str:
    """Pick the batch layout (Config.layout docstring): single-tile dense
    MXU blocks when the dataset's largest graph and the device-resident
    footprint fit (small-graph datasets — the per-step program is a
    handful of fat matmuls, which beats every sparse formulation at these
    sizes); block-sparse for heavy-tailed datasets (D&D: 2.1× the
    multi-tile dense engine's fp32 epoch time, and ~2.8× less HBM); the
    COO/SpMM path as the memory-safe fallback. The multi-tile dense
    engine remains available as --layout multi.

    Measured on-chip (2026-08-19, sequential folds, 10 folds x 10
    epochs on COLLAB): multi 20.5 ms median epoch vs dense 35.7 vs
    block 36.7 — when the fold-lockstep fast path can NOT engage (the
    stacked 10-fold step exceeds Config.lockstep_max_step_bytes), the
    single-tile gather traffic (slots·n_tile²) dominates the step and
    the size-bucketed multi layout wins; when lockstep DOES engage
    (NCI1 steady state: lockstep 5.4 ms/fold-epoch train-only /
    6.0 incl eval, vs multi's 14.8 and sequential dense's 7.2) dense
    stays the winner. Hence the demotion below is gated on lockstep
    eligibility AND a ≥2× expected-tile-traffic ratio. Block was the
    measured loser on COLLAB both ways (plus a ~10× larger one-time
    pool build). Caution for future A/Bs: a run whose folds fit ONE
    fused dispatch reports one-time program-load cost inside
    epoch_seconds (an early 10-epoch lockstep probe read 78 ms/fold-
    epoch; the 100-epoch steady state is 6.0)."""
    if cfg.layout != "auto":
        return cfg.layout
    n_tile = dense_tile(dataset)
    # footprint at the RESOLVED storage widths: bf16 adjacencies (via
    # adj_dtype or bf16 compute) halve the dominant G·n_tile² term, which
    # can be the difference between the fast dense path and a demotion
    adj_bytes = 2 if (
        cfg.compute_dtype == "bfloat16"
        or cfg.resolved_adj_dtype() == "bfloat16"
    ) else 4
    if (
        n_tile <= cfg.dense_max_nodes
        and dense_dataset_bytes(dataset, n_tile, adj_bytes)
        <= cfg.dense_max_device_bytes
    ):
        multi_runnable = cfg.mesh_shape == (1, 1) or (
            _batched_lockstep_would_engage(cfg)
        )
        if multi_runnable and not _lockstep_would_engage(
            cfg, dataset, n_tile
        ):
            # Sequential-fold regime: the per-step adjacency gather is
            # the dominant HBM stream (profile_step.py COLLAB anatomy:
            # gather ≈ 46% of the full step). If bucketing graphs onto
            # their own geometric tiles cuts that stream ≥2×, the multi
            # engine wins despite its per-class program overhead.
            from dgcnn_tpu.batching.multi_dense import (
                multi_dense_bytes,
                plan_tiles,
            )

            nc = dataset.node_counts()
            tiles = plan_tiles(nc, cfg.multi_dense_min_tile)
            if len(tiles) > 1:
                tile_of = np.asarray(tiles, dtype=np.float64)[
                    np.searchsorted(np.asarray(tiles), nc, side="left")
                ]
                mean_tile_sq = float((tile_of * tile_of).mean())
                if (
                    n_tile * n_tile >= 2.0 * mean_tile_sq
                    and multi_dense_bytes(dataset, tiles)
                    <= cfg.dense_max_device_bytes
                ):
                    return "multi"
        return "dense"
    from dgcnn_tpu.batching.block_sparse import block_graphset_bytes

    if block_graphset_bytes(dataset) <= cfg.dense_max_device_bytes:
        return "block"
    return "coo"


def _completed_fold_accuracies(csv_path: str, num_epochs: int) -> Optional[Tuple[float, float]]:
    """If a fold CSV already holds `num_epochs` rows, return its last-epoch
    (train_acc, test_acc) so `--resume` can skip the fold."""
    if not os.path.exists(csv_path):
        return None
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    if len(lines) != num_epochs + 1:
        return None
    last = lines[-1].split(",")
    return float(last[3]), float(last[4])


class EngineBase:
    """Common engine surface. `run_epochs` executes k consecutive
    train+eval epochs and returns per-epoch metric rows; the base
    implementation is one dispatch per epoch, engines that can fuse
    epochs into a single device program override it (DenseEngine)."""

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        rows = []
        for perm in perms:
            params, opt_state, rng, tr_loss, tr_correct = self.train_epoch(
                params, opt_state, rng, perm
            )
            te_loss, te_correct = self.eval_test(params)
            rows.append((tr_loss, te_loss, tr_correct, te_correct))
        rows = np.asarray(jax.device_get(rows), dtype=np.float64)
        return params, opt_state, rng, rows


class CooEngine(EngineBase):
    """Epoch engine for the COO layout: host packing per epoch (pad-and-
    bucket), jitted scan over the stacked batches."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        self.cfg = cfg
        self.dataset = dataset
        bucket = compute_bucket(
            dataset, cfg.batch_size, cfg.node_pad_multiple,
            cfg.edge_pad_multiple, cfg.graph_pad_multiple,
        )
        self._bucket = bucket
        if cfg.spmm_impl == "pallas":
            # opt-in block-pair structures (kernels/spmm_block_coo.py):
            # apply_coo routes the aggregation to the block-COO Pallas
            # kernel when a batch carries them. Host build cost is a few
            # ms per epoch — explicit pallas only, not "auto"
            from dgcnn_tpu.batching.packer import (
                add_blockcoo,
                blockcoo_item_bound,
            )

            w_bound = blockcoo_item_bound(dataset, cfg.batch_size)
            self._pack = lambda ds, order: add_blockcoo(
                pack_epoch(ds, order, cfg.batch_size, bucket),
                pad_items_to=w_bound,
            )
        else:
            self._pack = lambda ds, order: pack_epoch(
                ds, order, cfg.batch_size, bucket
            )
        self._train = make_train_epoch(model, optimizer, cfg.spmm_impl)
        self._eval = make_eval_epoch(model, cfg.spmm_impl)
        self._run = make_coo_run(model, optimizer, cfg.spmm_impl)

    def _epoch_bytes(self, n_train: int) -> int:
        """Device bytes of one packed epoch (x dominates; edge/node
        bookkeeping arrays included)."""
        steps = -(-n_train // self.cfg.batch_size)
        b = self._bucket
        per_step = (
            b.num_nodes * (self.dataset.num_features * 4 + 8)
            + b.num_edges * 12
            + b.num_graphs * 8
            + 4
        )
        return steps * per_step

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_set = self.dataset.subset(train_idx)
        test_set = self.dataset.subset(test_idx)
        # test batches never reshuffle (reference train.py:109: shuffle=False)
        self._test_batches = jax.device_put(
            self._pack(test_set, np.arange(test_set.num_graphs))
        )
        # COO epochs must be host-packed and shipped, so fusion is chunked
        # by a transfer budget rather than fused whole like the dense path
        self._fuse_epochs = int(
            np.clip(self.cfg.coo_fuse_bytes // max(self._epoch_bytes(
                len(train_idx)), 1), 1, 64)
        )

    def train_epoch(self, params, opt_state, rng, perm: np.ndarray):
        batches = self._pack(self._train_set, perm)
        return self._train(params, opt_state, rng, batches)

    def eval_test(self, params):
        return self._eval(params, self._test_batches)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        import jax.tree_util as jtu

        all_rows = []
        i = 0
        while i < len(perms):
            r = min(len(perms) - i, self._fuse_epochs)
            stacked = jtu.tree_map(
                lambda *xs: np.stack(xs),
                *[self._pack(self._train_set, p) for p in perms[i : i + r]],
            )
            params, opt_state, rng, rows = self._run(
                params, opt_state, rng, jax.device_put(stacked),
                self._test_batches,
            )
            all_rows.append(np.asarray(jax.device_get(rows), dtype=np.float64))
            i += r
        return params, opt_state, rng, np.concatenate(all_rows, axis=0)


class DeviceCooEngine(EngineBase):
    """Device-resident COO engine — the default for datasets too
    large-grained for the dense layout (D&D): the flattened GraphSet lives
    in HBM once (batching/device_coo.py), batches are assembled on device
    from graph ids, and whole epoch ranges run as one fused program. An
    epoch's host↔device traffic is one [steps, slots] int32 matrix —
    the same contract as the dense engine, at O(nodes+edges) memory."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from dgcnn_tpu.batching.device_coo import build_device_graphset
        from dgcnn_tpu.batching.packer import BucketSpec
        from dgcnn_tpu.train.loop import make_device_coo_run

        self.cfg = cfg
        self._model, self._optimizer = model, optimizer
        self._BucketSpec = BucketSpec
        self._make_run = make_device_coo_run
        self._slots = _round_up(cfg.batch_size, cfg.graph_pad_multiple)
        # per-graph sizes for ADAPTIVE buckets: the worst-case bucket (sum
        # of the batch_size largest graphs) over-pads skewed datasets like
        # D&D ~7x; since batch composition is known on host before a chunk
        # dispatches, size the bucket to the chunk's actual max batch
        # instead (rounded up, so a handful of programs cover a run)
        self._node_counts = dataset.node_counts().astype(np.int64)
        self._edge_counts = dataset.edge_counts().astype(np.int64)
        self._dev = jax.device_put(build_device_graphset(dataset))
        self._runs = {}
        # monotone bucket state: grow-only across chunks AND folds, so a
        # whole CV run compiles 1-2 programs instead of one per fold
        self._floor_nodes = cfg.node_pad_multiple
        self._floor_edges = cfg.edge_pad_multiple

    @staticmethod
    def _geom_round(x: int, multiple: int, ratio: float = 1.3) -> int:
        """Round up onto a geometric grid (ratio steps, multiple-aligned):
        bounds padding waste at `ratio` while keeping the number of
        distinct compiled programs logarithmic in the size range."""
        v = multiple
        while v < x:
            v = _round_up(int(v * ratio) + 1, multiple)
        return v

    def _bucket_for(self, *order_mats) -> "BucketSpec":
        from dgcnn_tpu.batching.device_coo import batch_extents

        n = e = 1
        for m in order_mats:
            bn, be = batch_extents(self._node_counts, self._edge_counts, m)
            n, e = max(n, bn), max(e, be)
        self._floor_nodes = max(
            self._floor_nodes, self._geom_round(n, self.cfg.node_pad_multiple)
        )
        self._floor_edges = max(
            self._floor_edges, self._geom_round(e, self.cfg.edge_pad_multiple)
        )
        return self._BucketSpec(
            num_nodes=self._floor_nodes,
            num_edges=self._floor_edges,
            num_graphs=self._slots,
        )

    def _runner(self, bucket):
        if bucket not in self._runs:
            self._runs[bucket] = self._make_run(
                self._model, self._optimizer, bucket, self.cfg.spmm_impl
            )
        return self._runs[bucket]

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int32)
        self._test_order = order_matrix(
            np.asarray(test_idx, np.int32), self.cfg.batch_size, self._slots
        )
        # the test order never changes within a fold — ship it once, not
        # once per fused chunk (H2D on this transport is the scarce lane)
        self._test_order_dev = jax.device_put(self._test_order)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order3d = np.stack(
            [
                order_matrix(self._train_idx[p], self.cfg.batch_size, self._slots)
                for p in perms
            ]
        )
        bucket = self._bucket_for(order3d, self._test_order)
        params, opt_state, rng, rows = self._runner(bucket)(
            params, opt_state, rng, self._dev, jax.device_put(order3d),
            self._test_order_dev,
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class BlockSparseEngine(EngineBase):
    """Block-sparse engine (batching/block_sparse.py): the dataset lives
    in HBM as a pool of nonzero 128×128 normalized-adjacency blocks;
    batches are assembled on device from graph ids and GCN propagation is
    a batched MXU matmul over block work items + a sorted block
    segment-sum. Per-batch FLOPs follow each graph's own block grid —
    neither the single-tile layout's max-graph² padding nor the
    multi-tile layout's per-class slot floors. Same epoch-fusion and
    [epochs, steps, slots] host-traffic contract as DeviceCooEngine;
    budgets (block-rows, work items) grow only on a geometric grid so a
    CV run compiles 1-2 programs."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from dgcnn_tpu.batching.block_sparse import build_block_graphset
        from dgcnn_tpu.train.loop import make_block_run

        self.cfg = cfg
        self._model, self._optimizer = model, optimizer
        self._make_run = make_block_run
        self._slots = _round_up(cfg.batch_size, cfg.graph_pad_multiple)
        dev = build_block_graphset(dataset)
        self._nb = dev.nb.astype(np.int64)
        self._block_counts = dev.block_count.astype(np.int64)
        pool_dt = (
            cfg.compute_dtype if cfg.compute_dtype != "float32"
            else cfg.resolved_adj_dtype()
        )
        if pool_dt != "float32":
            # store the block pool rounded: halves the dominant HBM stream
            # (the per-item block reads) and the one-time H2D transfer;
            # under the MXU's DEFAULT fp32 matmul precision the operands
            # are rounded to bf16 anyway (Config.adj_dtype)
            import jax.numpy as jnp

            dev = dataclasses.replace(
                dev, pool=dev.pool.astype(jnp.dtype(pool_dt))
            )
        self._dev = jax.device_put(dev)
        self._runs = {}
        self._floor_nb = 8
        self._floor_w = 64

    def _budget_for(self, *order_mats) -> tuple:
        from dgcnn_tpu.batching.block_sparse import block_batch_extents

        nb = w = 1
        for m in order_mats:
            bn, bw = block_batch_extents(self._nb, self._block_counts, m)
            nb, w = max(nb, bn), max(w, bw)
        self._floor_nb = max(self._floor_nb, DeviceCooEngine._geom_round(nb, 8))
        self._floor_w = max(self._floor_w, DeviceCooEngine._geom_round(w, 64))
        return self._floor_nb, self._floor_w

    def _runner(self, budget):
        if budget not in self._runs:
            self._runs[budget] = self._make_run(
                self._model, self._optimizer, *budget,
                block_impl=self.cfg.resolved_block_impl(),
            )
        return self._runs[budget]

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int32)
        self._test_order = order_matrix(
            np.asarray(test_idx, np.int32), self.cfg.batch_size, self._slots
        )
        # shipped once per fold, not once per fused chunk
        self._test_order_dev = jax.device_put(self._test_order)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order3d = np.stack(
            [
                order_matrix(self._train_idx[p], self.cfg.batch_size, self._slots)
                for p in perms
            ]
        )
        budget = self._budget_for(order3d, self._test_order)
        params, opt_state, rng, rows = self._runner(budget)(
            params, opt_state, rng, self._dev, jax.device_put(order3d),
            self._test_order_dev,
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class DenseEngine(EngineBase):
    """Epoch engine for the dense layout: the whole dataset lives on device
    in dense form (batching/dense.py DenseDataset); an epoch ships only the
    shuffled [steps, slots] index matrix and batches are gathered on
    device. `run_epochs` fuses whole epoch RANGES into one dispatch
    (train/loop.py make_dense_gather_run) — on this transport a dispatch
    costs more than a small-dataset epoch computes, so fusion is the
    difference between latency-bound and compute-bound training."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        self.cfg = cfg
        n_tile = dense_tile(dataset)
        self._slots = _round_up(cfg.batch_size, cfg.graph_pad_multiple)
        self._data = build_dense_dataset_on_device(
            dataset, n_tile, adj_dtype=cfg.resolved_adj_dtype()
        )
        if cfg.compute_dtype != "float32":
            # store the device-resident dataset in the compute dtype: halves
            # both the HBM footprint and the per-batch gather traffic (adj
            # dominates — batching/dense.py)
            import jax.numpy as jnp

            dt = jnp.dtype(cfg.compute_dtype)
            self._data = jax.tree_util.tree_map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                self._data,
            )
        self._train, self._eval = make_dense_gather_epochs(model, optimizer)
        self._run = make_dense_gather_run(model, optimizer)

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int32)
        self._test_order = jax.device_put(
            order_matrix(test_idx, self.cfg.batch_size, self._slots)
        )

    def train_epoch(self, params, opt_state, rng, perm: np.ndarray):
        order2d = order_matrix(
            self._train_idx[perm], self.cfg.batch_size, self._slots
        )
        return self._train(params, opt_state, rng, self._data, order2d)

    def eval_test(self, params):
        return self._eval(params, self._data, self._test_order)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order3d = np.stack(
            [
                order_matrix(self._train_idx[p], self.cfg.batch_size, self._slots)
                for p in perms
            ]
        )
        params, opt_state, rng, rows = self._run(
            params, opt_state, rng, self._data, jax.device_put(order3d),
            self._test_order,
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class MultiDenseEngine(EngineBase):
    """Size-bucketed multi-tile dense engine (batching/multi_dense.py):
    heavy-tailed datasets (D&D) run as per-class MXU matmuls instead of
    per-edge gathers. Per-class slot counts grow only (rounded to 4) so a
    run compiles a handful of programs."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from dgcnn_tpu.batching.multi_dense import (
            build_multi_dense_on_device,
            class_batch_counts,
            plan_tiles,
            route_order_rows,
        )
        from dgcnn_tpu.train.loop import make_multi_dense_run

        self.cfg = cfg
        self._counts_fn = class_batch_counts
        self._route = route_order_rows
        tiles = plan_tiles(dataset.node_counts(), cfg.multi_dense_min_tile)
        classes, self._routing = build_multi_dense_on_device(
            dataset, tiles, adj_dtype=cfg.resolved_adj_dtype()
        )
        if cfg.compute_dtype != "float32":
            import jax.numpy as jnp

            dt = jnp.dtype(cfg.compute_dtype)
            classes = jax.tree_util.tree_map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                classes,
            )
        self._data = classes
        self._run = make_multi_dense_run(model, optimizer)
        self._slot_floor = np.full(len(tiles), 4, dtype=np.int64)
        # pre-grow the slot floors over sampled full-dataset shuffles so
        # the first compiled program covers (nearly) every batch the run
        # will see — per-chunk slot growth forces a full recompile, which
        # is expensive for the conditional multi-class program. The
        # grow-only fallback still guards genuinely unlucky batches.
        warm_rng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 0]))
        self._slots_for(
            *(warm_rng.permutation(dataset.num_graphs) for _ in range(40))
        )
        # cap at the batch size (a class can never exceed it); headroom
        # beyond the warmed floors was measured to cost more device time
        # (~20%/epoch) than the occasional extra compile it avoids
        cap = -(-cfg.batch_size // 4) * 4
        self._slot_floor = np.minimum(self._slot_floor, cap)

    def _slots_for(self, *order_seqs) -> tuple:
        """Grow-only per-class slot counts covering every batch in the
        given graph-id sequences (each [**, batch chunks])."""
        need = self._slot_floor
        for ids_seq in order_seqs:
            counts = self._counts_fn(self._routing, ids_seq, self.cfg.batch_size)
            need = np.maximum(need, counts.max(axis=0))
        self._slot_floor = -(-need // 4) * 4  # round up, grow-only
        return tuple(int(s) for s in self._slot_floor)

    def _epoch_orders(self, ids_seq: np.ndarray, slots: tuple):
        """One epoch → per-class [steps, S_c] arrays."""
        bs = self.cfg.batch_size
        step_rows = [
            self._route(self._routing, ids_seq[i : i + bs], slots)
            for i in range(0, len(ids_seq), bs)
        ]
        return tuple(
            np.stack([rows[c] for rows in step_rows])
            for c in range(len(slots))
        )

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int64)
        self._test_idx = np.asarray(test_idx, dtype=np.int64)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        epoch_ids = [self._train_idx[p] for p in perms]
        slots = self._slots_for(*epoch_ids, self._test_idx)
        per_epoch = [self._epoch_orders(ids, slots) for ids in epoch_ids]
        orders = tuple(
            np.stack([pe[c] for pe in per_epoch]) for c in range(len(slots))
        )
        test_orders = self._epoch_orders(self._test_idx, slots)
        params, opt_state, rng, rows = self._run(
            params, opt_state, rng, self._data,
            jax.device_put(orders), jax.device_put(test_orders),
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class MeshCooEngine(EngineBase):
    """Mesh-sharded COO engine: data parallelism over LPT-balanced
    sub-batches × edge-partitioned aggregation (parallel/train_dp.py).
    Exact global-batch loss/gradients — the training protocol is identical
    to single-chip (tests/test_parallel.py)."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from dgcnn_tpu.parallel import (
            make_dp_eval_epoch,
            make_dp_train_epoch,
            make_mesh,
            pack_epoch_dp,
            shard_bucket,
        )
        from dgcnn_tpu.parallel.train_dp import device_put_epoch

        self.cfg = cfg
        self.dataset = dataset
        n_data, n_graph = cfg.mesh_shape
        self.mesh = make_mesh(cfg.mesh_shape)
        bucket = shard_bucket(
            dataset, cfg.batch_size, n_data,
            cfg.node_pad_multiple, cfg.edge_pad_multiple,
            cfg.graph_pad_multiple, n_graph,
        )
        self._pack = lambda ds, order: device_put_epoch(
            pack_epoch_dp(ds, order, cfg.batch_size, bucket, n_data, n_graph),
            self.mesh,
        )
        self._train = make_dp_train_epoch(model, optimizer, self.mesh, cfg.spmm_impl)
        self._eval = make_dp_eval_epoch(model, self.mesh, cfg.spmm_impl)

    def begin_fold(self, train_idx, test_idx):
        self._train_set = self.dataset.subset(train_idx)
        test_set = self.dataset.subset(test_idx)
        self._test_batches = self._pack(test_set, np.arange(test_set.num_graphs))

    def train_epoch(self, params, opt_state, rng, perm):
        return self._train(params, opt_state, rng, self._pack(self._train_set, perm))

    def eval_test(self, params):
        return self._eval(params, self._test_batches)


class MeshHaloEngine(EngineBase):
    """Mesh engine for the HALO layout (SURVEY §2e item 2's stated
    design): the packed node axis is SHARDED over the mesh "graph" axis —
    per-device feature blocks are 1/n_graph the sub-batch's node budget —
    and each GCN layer exchanges only H boundary rows with the two
    neighbor shards via `ppermute` (parallel/halo.py) instead of
    all-reducing the full node block. Exact vs single-chip
    (tests/test_halo.py partition invariance)."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from dgcnn_tpu.batching.shard_pack import halo_bucket, pack_epoch_halo
        from dgcnn_tpu.parallel import make_mesh
        from dgcnn_tpu.parallel.halo import (
            device_put_halo_epoch,
            make_halo_eval_epoch,
            make_halo_train_epoch,
        )

        self.cfg = cfg
        self.dataset = dataset
        n_data, n_graph = cfg.mesh_shape
        self.mesh = make_mesh(cfg.mesh_shape)
        bucket = halo_bucket(
            dataset, cfg.batch_size, n_data, n_graph,
            cfg.node_pad_multiple, cfg.edge_pad_multiple,
            cfg.graph_pad_multiple,
        )
        self._bucket = bucket
        self._pack = lambda ds, order: device_put_halo_epoch(
            pack_epoch_halo(
                ds, order, cfg.batch_size, n_data, n_graph, bucket
            ),
            self.mesh, bucket.halo,
        )
        self._train = make_halo_train_epoch(
            model, optimizer, self.mesh, bucket.halo
        )
        self._eval = make_halo_eval_epoch(model, self.mesh, bucket.halo)

    def begin_fold(self, train_idx, test_idx):
        self._train_set = self.dataset.subset(train_idx)
        test_set = self.dataset.subset(test_idx)
        self._test_batches = self._pack(test_set, np.arange(test_set.num_graphs))

    def train_epoch(self, params, opt_state, rng, perm):
        return self._train(params, opt_state, rng, self._pack(self._train_set, perm))

    def eval_test(self, params):
        return self._eval(params, self._test_batches)


class MeshDeviceCooEngine(EngineBase):
    """Mesh-sharded device-resident COO engine: the DeviceGraphSet is
    replicated across the mesh; each "data"-axis device assembles its
    LPT-balanced sub-batch on device and each "graph"-axis device
    aggregates its contiguous edge chunk (psum per layer). Whole epoch
    ranges fuse into one dispatch; host traffic per epoch is one
    [steps, n_data, slots] int32 tensor. Adaptive grow-only buckets as in
    DeviceCooEngine."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dgcnn_tpu.batching.device_coo import build_device_graphset
        from dgcnn_tpu.batching.packer import BucketSpec
        from dgcnn_tpu.parallel import make_mesh
        from dgcnn_tpu.parallel.shard import lpt_assign
        from dgcnn_tpu.parallel.train_dp import make_device_coo_dp_run

        self.cfg = cfg
        self._model, self._optimizer = model, optimizer
        self._BucketSpec = BucketSpec
        self._lpt = lpt_assign
        self._make_run = make_device_coo_dp_run
        self.n_data, self.n_graph = cfg.mesh_shape
        self.mesh = make_mesh(cfg.mesh_shape)
        self._slots = max(1, -(-cfg.batch_size // self.n_data))
        self._node_counts = dataset.node_counts().astype(np.int64)
        self._edge_counts = dataset.edge_counts().astype(np.int64)
        self._dev = jax.device_put(
            build_device_graphset(dataset), NamedSharding(self.mesh, P())
        )
        self._o3_sharding = NamedSharding(self.mesh, P(None, "data"))
        self._o4_sharding = NamedSharding(self.mesh, P(None, None, "data"))
        self._runs = {}
        self._floor_nodes = cfg.node_pad_multiple
        # edge chunks must divide evenly across the graph axis
        self._edge_multiple = cfg.edge_pad_multiple * self.n_graph
        self._floor_edges = self._edge_multiple

    def _batch_rows(self, ids: np.ndarray) -> np.ndarray:
        """One global batch → [n_data, slots]: LPT node balance, capped."""
        out = np.full((self.n_data, self._slots), -1, np.int32)
        groups = self._lpt(self._node_counts[ids], self.n_data, self._slots)
        for d, g in enumerate(groups):
            out[d, : len(g)] = ids[g]
        return out

    def _epoch_order(self, ids_seq: np.ndarray) -> np.ndarray:
        bs = self.cfg.batch_size
        return np.stack(
            [
                self._batch_rows(ids_seq[i : i + bs])
                for i in range(0, len(ids_seq), bs)
            ]
        )

    def _bucket_for(self, *order_mats) -> "BucketSpec":
        from dgcnn_tpu.batching.device_coo import batch_extents

        geom = DeviceCooEngine._geom_round
        n = e = 1
        for m in order_mats:
            bn, be = batch_extents(self._node_counts, self._edge_counts, m)
            n, e = max(n, bn), max(e, be)
        self._floor_nodes = max(
            self._floor_nodes, geom(n, self.cfg.node_pad_multiple)
        )
        self._floor_edges = max(self._floor_edges, geom(e, self._edge_multiple))
        return self._BucketSpec(self._floor_nodes, self._floor_edges, self._slots)

    def _runner(self, bucket):
        if bucket not in self._runs:
            self._runs[bucket] = self._make_run(
                self._model, self._optimizer, self.mesh, bucket,
                self.cfg.spmm_impl,
            )
        return self._runs[bucket]

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int64)
        self._test_order = self._epoch_order(np.asarray(test_idx, np.int64))

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order4d = np.stack([self._epoch_order(self._train_idx[p]) for p in perms])
        bucket = self._bucket_for(order4d, self._test_order)
        params, opt_state, rng, rows = self._runner(bucket)(
            params, opt_state, rng, self._dev,
            jax.device_put(order4d, self._o4_sharding),
            jax.device_put(self._test_order, self._o3_sharding),
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class MeshDenseEngine(EngineBase):
    """Mesh-sharded dense engine: the DenseDataset is replicated across the
    mesh and each data-axis device gathers its round-robin share of every
    batch on device (parallel/train_dp.py make_dense_dp_epochs)."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dgcnn_tpu.batching.dense import order_matrix_dp
        from dgcnn_tpu.parallel import make_mesh
        from dgcnn_tpu.parallel.train_dp import (
            make_dense_dp_epochs,
            make_dense_dp_run,
        )

        self.cfg = cfg
        self.n_data = cfg.mesh_shape[0]
        self.mesh = make_mesh(cfg.mesh_shape)
        self._slots = max(
            1, -(-cfg.batch_size // self.n_data)
        )
        n_tile = dense_tile(dataset)
        # densify on one device from the compact COO graphset, then
        # broadcast-replicate across the mesh (device-to-device over ICI
        # beats shipping O(G·n_tile²) from the host)
        self._data = jax.device_put(
            build_dense_dataset_on_device(
                dataset, n_tile, adj_dtype=cfg.resolved_adj_dtype()
            ),
            NamedSharding(self.mesh, P()),
        )
        self._order_sharding = NamedSharding(self.mesh, P(None, "data"))
        self._order4d_sharding = NamedSharding(self.mesh, P(None, None, "data"))
        self._order_np = lambda idx: order_matrix_dp(
            idx, cfg.batch_size, self.n_data, self._slots
        )
        self._order = lambda idx: jax.device_put(
            self._order_np(idx), self._order_sharding
        )
        self._train, self._eval = make_dense_dp_epochs(model, optimizer, self.mesh)
        self._run = make_dense_dp_run(model, optimizer, self.mesh)

    def begin_fold(self, train_idx, test_idx):
        self._train_idx = np.asarray(train_idx, dtype=np.int32)
        self._test_order = self._order(test_idx)

    def train_epoch(self, params, opt_state, rng, perm):
        return self._train(
            params, opt_state, rng, self._data, self._order(self._train_idx[perm])
        )

    def eval_test(self, params):
        return self._eval(params, self._data, self._test_order)

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order4d = jax.device_put(
            np.stack([self._order_np(self._train_idx[p]) for p in perms]),
            self._order4d_sharding,
        )
        params, opt_state, rng, rows = self._run(
            params, opt_state, rng, self._data, order4d, self._test_order
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


class MeshBlockEngine(EngineBase):
    """Mesh-sharded block-sparse engine: the BlockGraphSet (pool + block
    tables + block-row features) is replicated across the mesh; each
    "data"-axis device assembles its LPT-balanced (by work items ≈ FLOPs)
    sub-batch on device and runs the block trunk; psum'd loss/grads keep
    the exact global-batch protocol (parallel/train_dp.py
    make_block_dp_run). Grow-only geometric budgets as in
    BlockSparseEngine, sized over PER-DEVICE sub-batch extents."""

    def __init__(self, cfg: Config, dataset: GraphSet, model: DGCNN,
                 optimizer: optax.GradientTransformation):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dgcnn_tpu.batching.block_sparse import build_block_graphset
        from dgcnn_tpu.parallel import make_mesh
        from dgcnn_tpu.parallel.shard import lpt_assign
        from dgcnn_tpu.parallel.train_dp import make_block_dp_run

        self.cfg = cfg
        self._model, self._optimizer = model, optimizer
        self._lpt = lpt_assign
        self._make_run = make_block_dp_run
        self.n_data = cfg.mesh_shape[0]
        self.mesh = make_mesh(cfg.mesh_shape)
        self._slots = max(1, -(-cfg.batch_size // self.n_data))
        dev = build_block_graphset(dataset)
        self._nb = dev.nb.astype(np.int64)
        self._block_counts = dev.block_count.astype(np.int64)
        pool_dt = (
            cfg.compute_dtype if cfg.compute_dtype != "float32"
            else cfg.resolved_adj_dtype()
        )
        if pool_dt != "float32":
            import jax.numpy as jnp

            dev = dataclasses.replace(
                dev, pool=dev.pool.astype(jnp.dtype(pool_dt))
            )
        self._dev = jax.device_put(dev, NamedSharding(self.mesh, P()))
        self._o3_sharding = NamedSharding(self.mesh, P(None, "data"))
        self._o4_sharding = NamedSharding(self.mesh, P(None, None, "data"))
        self._runs = {}
        self._floor_nb = 8
        self._floor_w = 64

    def _batch_rows(self, ids: np.ndarray) -> np.ndarray:
        """One global batch → [n_data, slots]: LPT balance on stored-block
        counts (the per-item batched matmul is the step's FLOPs), capped."""
        out = np.full((self.n_data, self._slots), -1, np.int32)
        groups = self._lpt(self._block_counts[ids], self.n_data, self._slots)
        for d, g in enumerate(groups):
            out[d, : len(g)] = ids[g]
        return out

    def _epoch_order(self, ids_seq: np.ndarray) -> np.ndarray:
        bs = self.cfg.batch_size
        return np.stack(
            [
                self._batch_rows(ids_seq[i : i + bs])
                for i in range(0, len(ids_seq), bs)
            ]
        )

    def _budget_for(self, *order_mats) -> tuple:
        from dgcnn_tpu.batching.block_sparse import block_batch_extents

        geom = DeviceCooEngine._geom_round
        nb = w = 1
        for m in order_mats:
            # last axis = slots, so [k, steps, n_data, slots] inputs size
            # the budget over every PER-DEVICE sub-batch row
            bn, bw = block_batch_extents(self._nb, self._block_counts, m)
            nb, w = max(nb, bn), max(w, bw)
        self._floor_nb = max(self._floor_nb, geom(nb, 8))
        self._floor_w = max(self._floor_w, geom(w, 64))
        return self._floor_nb, self._floor_w

    def _runner(self, budget):
        if budget not in self._runs:
            self._runs[budget] = self._make_run(
                self._model, self._optimizer, self.mesh, *budget,
                block_impl=self.cfg.resolved_block_impl(),
            )
        return self._runs[budget]

    def begin_fold(self, train_idx: np.ndarray, test_idx: np.ndarray) -> None:
        self._train_idx = np.asarray(train_idx, dtype=np.int64)
        self._test_order = self._epoch_order(np.asarray(test_idx, np.int64))

    def run_epochs(self, params, opt_state, rng, perms: np.ndarray):
        order4d = np.stack([self._epoch_order(self._train_idx[p]) for p in perms])
        budget = self._budget_for(order4d, self._test_order)
        params, opt_state, rng, rows = self._runner(budget)(
            params, opt_state, rng, self._dev,
            jax.device_put(order4d, self._o4_sharding),
            jax.device_put(self._test_order, self._o3_sharding),
        )
        return params, opt_state, rng, np.asarray(
            jax.device_get(rows), dtype=np.float64
        )


def _warn_measured_losers(cfg: Config, layout: str) -> None:
    """Explicitly selected paths that measured SLOWER than the defaults
    print their recorded on-chip A/B so nobody inherits a silent
    regression (VERDICT r2 #7). They stay selectable: both are correct,
    and the numbers below are shape-dependent (re-measure before trusting
    them on exotic shapes)."""
    if cfg.block_impl == "pallas" and layout == "block":
        print(
            "[dgcnn_tpu] note: --block_impl pallas is a measured LOSER vs "
            "the default XLA formulation on the DD anatomy (2026-08-19 "
            "v5e: fwd 712 vs 440 µs, full step 2876 vs 1763 µs over "
            "floor — per-item HBM→VMEM DMA latency at 128×128 blocks); "
            "kept for A/Bs (kernels/block_pallas.py docstring has the "
            "full record)",
            file=sys.stderr,
        )
    if cfg.spmm_impl == "pallas" and layout in ("coo",):
        print(
            "[dgcnn_tpu] note: --spmm pallas prefers the block-pair COO "
            "kernel (the measured auto winner: 6-16 µs/op on the batch "
            "microbench across transport states); where its structures/fit "
            "gates fail it falls back to kernels/spmm_pallas.py whose "
            "per-edge gather kernel measured 58.3 µs/op — 5.3× slower "
            "than the winner (BENCH_r02 spmm rows). Default --spmm auto "
            "never selects that fallback",
            file=sys.stderr,
        )


def make_engine(cfg: Config, dataset: GraphSet, model: DGCNN,
                optimizer: optax.GradientTransformation, layout: str):
    _warn_measured_losers(cfg, layout)
    if layout == "halo" and cfg.mesh_shape == (1, 1):
        raise ValueError(
            "layout='halo' shards the node axis over the mesh 'graph' "
            "axis — pass --mesh D,G with G>1 (or D·G>1); on one device "
            "use layout='coo'"
        )
    if cfg.mesh_shape != (1, 1):
        if layout == "multi":
            raise ValueError(
                f"layout={layout!r} is single-chip only; use layout='dense', "
                "'block', 'halo' or 'coo' (or 'auto') with a mesh"
            )
        if layout == "halo":
            cls = MeshHaloEngine
        elif layout == "dense":
            cls = MeshDenseEngine
        elif layout == "block":
            cls = MeshBlockEngine
        elif cfg.coo_assembly == "device":
            cls = MeshDeviceCooEngine
        else:
            cls = MeshCooEngine
    elif layout == "dense":
        cls = DenseEngine
    elif layout == "multi":
        cls = MultiDenseEngine
    elif layout == "block":
        cls = BlockSparseEngine
    elif cfg.spmm_impl == "pallas":
        # the block-pair Pallas SpMM needs host-built structures
        # (batching/packer.py add_blockcoo) — only the host-packing engine
        # attaches them; device-side assembly has no host pass to build on
        cls = CooEngine
    elif cfg.coo_assembly == "device":
        cls = DeviceCooEngine
    else:
        cls = CooEngine
    return cls(cfg, dataset, model, optimizer)


_LIVE_RENDER_MIN_SECONDS = 15.0
_live_render_last = [0.0]


def _maybe_render_live(cfg: Config) -> None:
    """Throttled best-effort curve refresh during a run (VERDICT r1 #8:
    run-end-only rendering left long DD runs blind). Never raises; never
    renders more than once per _LIVE_RENDER_MIN_SECONDS."""
    now = time.perf_counter()
    if now - _live_render_last[0] < _LIVE_RENDER_MIN_SECONDS:
        return
    _live_render_last[0] = now
    try:
        from dgcnn_tpu.train.plots import render_curves

        render_curves(cfg.statistics_dir, cfg.data_type)
    except Exception:
        pass  # partial CSVs mid-write, matplotlib missing, etc.


def run_fold(
    cfg: Config,
    dataset: GraphSet,
    model: DGCNN,
    fold_number: int,
    train_idx: np.ndarray,
    test_idx: np.ndarray,
    engine,
    events: EventLog,
    optimizer: optax.GradientTransformation,
) -> FoldMetrics:
    """One fold. The engine (and its jitted programs) is shared across folds
    so compilation happens once per shape, not once per fold."""
    n_train, n_test = len(train_idx), len(test_idx)
    # edges/s denominator only — no GraphSet.subset copy (that walks and
    # copies ~90% of the node/edge arrays per fold for one integer)
    train_edges = int(dataset.edge_counts()[np.asarray(train_idx)].sum())
    engine.begin_fold(train_idx, test_idx)

    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), fold_number)
    init_key, run_key = jax.random.split(key)
    params = init_params(init_key, model)
    opt_state = optimizer.init(params)

    shuffle_rng = np.random.default_rng(
        np.random.SeedSequence([cfg.seed, fold_number])
    )

    metrics = FoldMetrics()
    inflight = os.path.join(
        cfg.epochs_dir, f"{cfg.data_type}_{fold_number}_inflight"
    )
    start_epoch = 1
    if cfg.checkpoint_resume and checkpoint_exists(inflight):
        like = {
            "params": params,
            "opt_state": opt_state,
            "rng": run_key,
            "epoch": np.int64(0),
            "metrics": {c: np.zeros(0) for c in FoldMetrics.COLUMNS},
        }
        bundle = load_checkpoint(inflight, like)
        params, opt_state = bundle["params"], bundle["opt_state"]
        run_key = jax.numpy.asarray(bundle["rng"])
        start_epoch = int(bundle["epoch"]) + 1
        if start_epoch > cfg.num_epochs:
            raise ValueError(
                f"--resume checkpoint {inflight!r} is at epoch "
                f"{start_epoch - 1}, beyond --num_epochs="
                f"{cfg.num_epochs}: refusing to publish a "
                f"{start_epoch - 1}-epoch fold as a {cfg.num_epochs}-epoch "
                "protocol result. Rerun with the original --num_epochs or "
                "delete the inflight checkpoint."
            )
        metrics.rows = {c: list(map(float, bundle["metrics"][c]))
                        for c in FoldMetrics.COLUMNS}
        # replay the shuffle stream so epoch k sees the same permutation it
        # would have in an uninterrupted run
        for _ in range(start_epoch - 1):
            shuffle_rng.permutation(n_train)
        print(f"[fold {fold_number}] resumed at epoch {start_epoch}")

    # Epochs run in CHUNKS: `run_epochs` executes a whole range on device
    # (one dispatch for fused engines — see DenseEngine) and returns
    # per-epoch metric rows, so host round-trips happen once per chunk
    # instead of twice per epoch. Chunk boundaries align with the
    # checkpoint cadence; metric values are identical to per-epoch
    # execution (same RNG threading, same shuffle stream).
    epoch = start_epoch
    while epoch <= cfg.num_epochs:
        k = cfg.num_epochs - epoch + 1
        if cfg.max_fused_epochs:
            k = min(k, cfg.max_fused_epochs)
        if cfg.checkpoint_every:
            k = min(
                k,
                cfg.checkpoint_every - (epoch - 1) % cfg.checkpoint_every,
            )
        perms = np.stack([shuffle_rng.permutation(n_train) for _ in range(k)])

        t0 = time.perf_counter()
        params, opt_state, run_key, rows = engine.run_epochs(
            params, opt_state, run_key, perms
        )
        dt = (time.perf_counter() - t0) / k  # amortized per-epoch seconds

        for j in range(k):
            tr_loss, te_loss, tr_correct, te_correct = rows[j]
            train_acc = float(tr_correct) / n_train * 100.0
            test_acc = float(te_correct) / n_test * 100.0
            metrics.append(float(tr_loss), float(te_loss), train_acc, test_acc)
            events.write(
                kind="epoch",
                fold=fold_number,
                epoch=epoch + j,
                train_loss=float(tr_loss),
                test_loss=float(te_loss),
                train_accuracy=train_acc,
                test_accuracy=test_acc,
                epoch_seconds=dt,
                edges_per_second=train_edges / dt if dt > 0 else 0.0,
                # dt is the chunk wall-clock amortized over its epochs, so
                # every epoch of a chunk that compiled carries a share of
                # the compile time; consumers can filter on this field
                chunk_epochs=k,
            )
            if cfg.log_every and (epoch + j) % cfg.log_every == 0:
                print(
                    f"[fold {fold_number}] epoch {epoch + j}: "
                    f"train {tr_loss:.4f}/{train_acc:.2f}% "
                    f"test {te_loss:.4f}/{test_acc:.2f}% ({dt:.2f}s)"
                )
        epoch += k
        # live observability (the reference's visdom updates per epoch,
        # train.py:122-125): flush the in-progress fold CSV at every chunk
        # boundary and re-render the curve PNG on a throttle, so
        # multi-minute runs show progress instead of going dark until the
        # run tail
        if epoch <= cfg.num_epochs:
            metrics.to_csv(
                os.path.join(
                    cfg.statistics_dir,
                    f"{cfg.data_type}_results_{fold_number}.csv",
                )
            )
            _maybe_render_live(cfg)
        if cfg.checkpoint_every and (epoch - 1) % cfg.checkpoint_every == 0:
            save_checkpoint(
                inflight,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "rng": np.asarray(run_key),
                    "epoch": np.int64(epoch - 1),
                    "metrics": {
                        c: np.asarray(metrics.rows[c]) for c in FoldMetrics.COLUMNS
                    },
                },
            )

    # per-fold artifacts (reference train.py:129-131)
    save_checkpoint(
        os.path.join(cfg.epochs_dir, f"{cfg.data_type}_{fold_number}"),
        {"params": params, "opt_state": opt_state},
    )
    metrics.to_csv(
        os.path.join(cfg.statistics_dir, f"{cfg.data_type}_results_{fold_number}.csv")
    )
    for suffix in (".npz", ".treedef.json"):
        try:
            os.remove(inflight + suffix)
        except OSError:
            pass
    return metrics


def _enable_compile_cache(cfg: Config) -> None:
    """Persistent XLA compilation cache: the fused epoch programs compile
    in 30-120 s, so repeat runs at the same shapes should never recompile.
    Best-effort — harmless to skip on read-only filesystems."""
    if not cfg.xla_cache_dir:
        return
    try:
        path = os.path.expanduser(cfg.xla_cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"(compilation cache disabled: {e})")


def run_cross_validation(cfg: Config, dataset: Optional[GraphSet] = None, allow_synthetic: bool = False):
    """Full experiment — the equivalent of `python train.py` in the
    reference. Returns a result dict with per-fold and aggregate metrics."""
    _enable_compile_cache(cfg)
    if dataset is None:
        dataset, meta = load_dataset(
            cfg.data_type,
            root=cfg.data_root,
            use_node_attr=cfg.use_node_attr,
            allow_synthetic=allow_synthetic,
        )
        if meta.source == "synthetic":
            print(f"WARNING: using synthetic {cfg.data_type} profile data")

    # startup print, same info as reference train.py:87
    print(f"num_features={dataset.num_features}, num_classes={dataset.num_classes}")

    model = _model_from_config(
        cfg, dataset.num_features, dataset.num_classes, dataset.node_counts()
    )
    layout = choose_layout(cfg, dataset)

    fold_dir = cfg.fold_index_dir or os.path.join(
        cfg.data_root, cfg.data_type, "10fold_idx"
    )
    folds = get_folds(
        dataset.y, fold_dir, cfg.num_folds, cfg.seed, data_type=cfg.data_type
    )

    events = EventLog(
        os.path.join(cfg.statistics_dir, f"{cfg.data_type}_events.jsonl")
    )
    events.write(
        kind="run_start",
        data_type=cfg.data_type,
        num_graphs=dataset.num_graphs,
        num_features=dataset.num_features,
        num_classes=dataset.num_classes,
        layout=layout,
        # eval_shape: leaf shapes only, no device init/compile on the
        # startup path (every fold re-inits its own params anyway)
        num_params=num_params(
            jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), model))
        ),
    )

    optimizer = optax.adam(
        cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps
    )
    if cfg.opt_flatten:
        from dgcnn_tpu.train.flat_opt import flatten_optimizer

        optimizer = flatten_optimizer(optimizer)

    # fold-lockstep execution (train/cv_vmap.py): near-K× throughput for
    # small-dataset CV; bandwidth-bound datasets (big n_tile) get slower,
    # not faster — see Config.lockstep_max_step_bytes /
    # _lockstep_would_engage. Checkpoint/resume works in lockstep too:
    # ONE stacked inflight bundle advances all folds together
    # (cv_vmap.py), since lockstep folds can't pause individually.
    if cfg.cv_parallel == "folds":
        # explicit lockstep request: fail loudly on incompatible settings
        # instead of silently building an infeasible dense dataset
        problems = []
        if layout not in ("dense", "block", "multi"):
            problems.append(
                f"layout={layout!r} (lockstep runs on the dense, "
                f"block-sparse or multi-tile layout; this dataset "
                f"resolved to {layout!r})"
            )
        if fold_shard_devices(cfg.mesh_shape, cfg.num_folds) is None:
            problems.append(
                f"mesh_shape={cfg.mesh_shape} (fold-sharded lockstep "
                f"needs a (D, 1) mesh; D ∤ num_folds is fine — the "
                f"fold axis pads with masked folds)"
            )
        if problems:
            raise ValueError(
                "cv_parallel='folds' is incompatible with: "
                + "; ".join(problems)
            )
        use_lockstep = True
    else:
        # same predicates choose_layout consulted (a dense dataset that
        # locksteps is never demoted to multi; one that can't may be)
        d = fold_shard_devices(cfg.mesh_shape, cfg.num_folds)
        use_lockstep = (
            layout == "dense"
            and _lockstep_would_engage(cfg, dataset, dense_tile(dataset))
        ) or (
            layout == "block" and _batched_lockstep_would_engage(cfg)
        ) or (
            # multi-lockstep measured SLOWER than the sequential multi
            # engine on one chip (23.2 vs 14.7 ms/fold-epoch, COLLAB
            # 2026-08-20) — engage it under auto only when a fold-
            # shardable mesh makes K-fold concurrency the win
            layout == "multi"
            and cfg.cv_parallel == "auto"
            and d is not None
            and d > 1
        )
    from dgcnn_tpu.utils.platform import DispatchWatchdog

    # first device work (dataset H2D/densify + first fused epoch program)
    # on a remote transport can hang without error — print a hint if it
    # hasn't completed in 15 min instead of stalling silently forever
    watchdog = DispatchWatchdog(900, f"{cfg.data_type} first fold").start()

    if use_lockstep:
        if cfg.checkpoint_resume:
            # completed-run fast path (lockstep writes fold CSVs at run
            # end, so either every fold is complete or none is)
            done = [
                _completed_fold_accuracies(
                    os.path.join(
                        cfg.statistics_dir,
                        f"{cfg.data_type}_results_{f}.csv",
                    ),
                    cfg.num_epochs,
                )
                for f in range(1, len(folds) + 1)
            ]
            if all(d is not None for d in done):
                for f, d in enumerate(done, start=1):
                    print(
                        f"[fold {f}] resumed (complete): test {d[1]:.2f}%"
                    )
                watchdog.cancel()
                return _finalize_cv(
                    cfg, events, [d[0] for d in done], [d[1] for d in done]
                )
            if cfg.cv_parallel != "folds" and any(d is not None for d in done):
                # PARTIAL completion under AUTO lockstep: honor the
                # per-fold resume contract (redo only missing folds) by
                # demoting to the sequential engine — lockstep advances
                # all folds together and would retrain the completed
                # ones too. Explicit cv_parallel='folds' keeps lockstep
                # semantics (documented: folds can't pause individually).
                print(
                    "[resume] partial run under auto-lockstep: redoing "
                    "only the incomplete folds sequentially"
                )
                use_lockstep = False

    if use_lockstep:

        from dgcnn_tpu.train.cv_vmap import run_cv_folds_vmap

        try:
            train_accs, test_accs = run_cv_folds_vmap(
                cfg, dataset, model, optimizer, folds, events, layout=layout
            )
        finally:
            watchdog.cancel()
        return _finalize_cv(cfg, events, train_accs, test_accs)

    engine = make_engine(cfg, dataset, model, optimizer, layout)

    train_accs, test_accs = [], []
    # fold progress bar with last-fold accuracy, like the reference's
    # tqdm wrapper (reference train.py:92,140)
    try:
        from tqdm import tqdm

        fold_iter = tqdm(
            list(enumerate(folds, start=1)),
            desc=f"processing {cfg.data_type}",
            unit="fold",
        )
    except ImportError:
        fold_iter = list(enumerate(folds, start=1))
        tqdm = None
    for fold_number, (train_idx, test_idx) in fold_iter:
        csv_path = os.path.join(
            cfg.statistics_dir, f"{cfg.data_type}_results_{fold_number}.csv"
        )
        ckpt_path = os.path.join(cfg.epochs_dir, f"{cfg.data_type}_{fold_number}")
        if cfg.checkpoint_resume and checkpoint_exists(ckpt_path):
            done = _completed_fold_accuracies(csv_path, cfg.num_epochs)
            if done is not None:
                train_accs.append(done[0])
                test_accs.append(done[1])
                print(f"[fold {fold_number}] resumed (complete): test {done[1]:.2f}%")
                continue

        t0 = time.perf_counter()
        try:
            metrics = run_fold(
                cfg, dataset, model, fold_number, train_idx, test_idx, engine,
                events, optimizer,
            )
        finally:
            watchdog.cancel()  # first fold done (or raised) — hint window over
        dt = time.perf_counter() - t0
        train_accs.append(metrics.last("train_accuracy"))
        test_accs.append(metrics.last("test_accuracy"))
        print(
            f"[{fold_number}] Train Acc: {train_accs[-1]:.2f}% "
            f"Test Acc: {test_accs[-1]:.2f}% ({dt:.1f}s)"
        )
        if tqdm is not None:
            fold_iter.set_postfix(test_acc=f"{test_accs[-1]:.2f}%")

    watchdog.cancel()  # no-op unless every fold was resume-skipped
    return _finalize_cv(cfg, events, train_accs, test_accs)


def _finalize_cv(cfg: Config, events: EventLog, train_accs, test_accs):
    """Shared run tail: overall CSV, curve PNGs, summary line, run_end
    event — identical for the sequential and fold-lockstep drivers."""
    write_overall_csv(
        os.path.join(cfg.statistics_dir, f"{cfg.data_type}_results_overall.csv"),
        train_accs,
        test_accs,
    )
    try:  # visdom-replacement curves (reference train.py:122-125)
        from dgcnn_tpu.train.plots import render_curves

        render_curves(cfg.statistics_dir, cfg.data_type)
    except Exception as e:  # plotting is best-effort observability
        print(f"(curve rendering skipped: {e})")
    if cfg.tensorboard_dir and events.path:
        try:  # TensorBoard export is best-effort observability too
            from dgcnn_tpu.train.tensorboard import export_events

            export_events(events.path, cfg.tensorboard_dir)
        except Exception as e:
            print(f"(tensorboard export skipped: {e})")
    tr, te = np.array(train_accs), np.array(test_accs)
    # same summary line format as reference train.py:146-148
    print(
        "Overall Training Accuracy: %.2f%% (std: %.2f) Testing Accuracy: %.2f%% (std: %.2f)"
        % (tr.mean(), tr.std(), te.mean(), te.std())
    )
    events.write(
        kind="run_end",
        train_accuracy_mean=float(tr.mean()),
        train_accuracy_std=float(tr.std()),
        test_accuracy_mean=float(te.mean()),
        test_accuracy_std=float(te.std()),
    )
    return {
        "train_accuracies": train_accs,
        "test_accuracies": test_accs,
        "train_accuracy_mean": float(tr.mean()),
        "train_accuracy_std": float(tr.std()),
        "test_accuracy_mean": float(te.mean()),
        "test_accuracy_std": float(te.std()),
    }
