"""Mesh-engine CV runs on the virtual 8-device CPU mesh: the full driver
(run_cross_validation) under DP×EP meshes for both layouts, and protocol
equivalence of the dense DP engine vs single-device."""

import jax
import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.train.cv import run_cross_validation


def _cfg(tmp_path, **kw):
    base = dict(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=2,
        num_folds=2,
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
        node_pad_multiple=64,
        edge_pad_multiple=128,
        graph_pad_multiple=4,
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize(
    "mesh,layout",
    [((4, 1), "dense"), ((2, 2), "coo"), ((4, 2), "coo"), ((8, 1), "dense"),
     ((2, 1), "block"), ((4, 2), "block")],
)
def test_cv_runs_on_mesh(tmp_path, mesh, layout):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=48, seed=5)
    result = run_cross_validation(
        _cfg(tmp_path, mesh_shape=mesh, layout=layout), dataset=gs
    )
    assert len(result["test_accuracies"]) == 2
    assert all(np.isfinite(a) for a in result["test_accuracies"])


def test_dense_dp_eval_matches_single_device():
    """Deterministic (eval) loss under the dense DP engine equals the
    single-device dense path on the same graphs — exact global-batch
    semantics (dropout RNG placement differs between engines, so only the
    deterministic path is bitwise-comparable)."""
    import optax

    from dgcnn_tpu.batching.dense import (
        build_dense_dataset,
        dense_tile,
        order_matrix,
        order_matrix_dp,
    )
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.parallel.train_dp import make_dense_dp_epochs
    from dgcnn_tpu.train.loop import make_dense_gather_epochs

    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=3)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    optimizer = optax.adam(1e-3)
    data = jax.device_put(build_dense_dataset(gs, dense_tile(gs)))
    idx = np.arange(40)

    _, eval_single = make_dense_gather_epochs(model, optimizer)
    want_loss, want_correct = jax.device_get(
        eval_single(params, data, order_matrix(idx, 16, 16))
    )

    mesh = make_mesh((4, 2))
    _, eval_dp = make_dense_dp_epochs(model, optimizer, mesh)
    got_loss, got_correct = jax.device_get(
        eval_dp(params, data, order_matrix_dp(idx, 16, 4, 4))
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5)
    assert got_correct == want_correct


@pytest.mark.parametrize("mesh", [(2, 2), (4, 2)])
@pytest.mark.slow
def test_cv_runs_on_mesh_host_coo(tmp_path, mesh):
    """The host-packing mesh COO engine stays available as a fallback."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=48, seed=5)
    result = run_cross_validation(
        _cfg(tmp_path, mesh_shape=mesh, layout="coo", coo_assembly="host"),
        dataset=gs,
    )
    assert len(result["test_accuracies"]) == 2
    assert all(np.isfinite(a) for a in result["test_accuracies"])


@pytest.mark.parametrize("mesh", [(4, 1), (2, 2), (1, 4)])
def test_device_coo_dp_eval_matches_single_chip(mesh):
    """Deterministic loss under the device-resident mesh COO engine equals
    the single-chip device-COO path on the same global batch — exact
    global-batch semantics under DP x edge partitioning."""
    import optax

    from dgcnn_tpu.batching import compute_bucket, pack_batch
    from dgcnn_tpu.batching.packer import BucketSpec
    from dgcnn_tpu.batching.device_coo import build_device_graphset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.parallel.shard import lpt_assign
    from dgcnn_tpu.parallel.train_dp import _make_device_coo_dp_loss
    from dgcnn_tpu.train.loop import nll_loss_and_correct

    gs = synthesize_tu_dataset("MUTAG", num_graphs=24, seed=3)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    idx = np.arange(20)

    # single-device reference (host packer — bit-equal to device assembly)
    b1 = jax.device_put(pack_batch(gs, idx, compute_bucket(gs, 20)))
    lp = apply(params, model, b1)
    want_loss, want_correct = jax.device_get(
        nll_loss_and_correct(lp, b1.y, b1.graph_mask)
    )

    n_data, n_graph = mesh
    m = make_mesh(mesh)
    slots = -(-len(idx) // n_data)
    rows = np.full((n_data, slots), -1, np.int32)
    for d, g in enumerate(lpt_assign(gs.node_counts()[idx], n_data, slots)):
        rows[d, : len(g)] = idx[g]
    nc, ec = gs.node_counts(), gs.edge_counts()
    bn = int(nc[np.maximum(rows, 0)].sum(1).max())
    be = int(ec[np.maximum(rows, 0)].sum(1).max())
    bucket = BucketSpec(
        -(-bn // 64) * 64, -(-be // (64 * n_graph)) * (64 * n_graph), slots
    )
    dev = jax.device_put(build_device_graphset(gs))
    loss_fn = _make_device_coo_dp_loss(model, m, bucket, "xla", True)
    got_loss, got_correct = jax.device_get(
        jax.jit(loss_fn)(params, dev, rows, jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, err_msg=str(mesh))
    assert got_correct == want_correct, mesh


@pytest.mark.parametrize("mesh", [(2, 1), (4, 2)])
def test_block_dp_eval_matches_single_chip(mesh):
    """Deterministic loss under the mesh block-sparse engine equals the
    single-chip block path on the same global batch (the graph axis is
    replicated — block propagation is already MXU-parallel)."""
    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_block, init_params
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.parallel.shard import lpt_assign
    from dgcnn_tpu.parallel.train_dp import _make_block_dp_loss
    from dgcnn_tpu.train.loop import nll_loss_and_correct

    gs = synthesize_tu_dataset("DD", num_graphs=14, seed=3)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    idx = np.arange(12)
    dev_host = build_block_graphset(gs)
    nb = dev_host.nb.astype(np.int64)
    wc = dev_host.block_count.astype(np.int64)

    # single-device reference over the whole global batch
    bn, bw = block_batch_extents(nb, wc, idx[None, :])
    dev = jax.device_put(dev_host)
    bb = gather_block_batch(dev, np.asarray(idx, np.int32), bn, bw)
    lp = apply_block(params, model, bb, dev.pool)
    want_loss, want_correct = jax.device_get(
        nll_loss_and_correct(lp, bb.y, bb.graph_mask)
    )

    n_data, _ = mesh
    m = make_mesh(mesh)
    slots = -(-len(idx) // n_data)
    rows = np.full((n_data, slots), -1, np.int32)
    for d, g in enumerate(lpt_assign(wc[idx], n_data, slots)):
        rows[d, : len(g)] = idx[g]
    sbn, sbw = block_batch_extents(nb, wc, rows)
    loss_fn = _make_block_dp_loss(model, m, max(sbn, 8), max(sbw, 8), True)
    got_loss, got_correct = jax.device_get(
        jax.jit(loss_fn)(params, jax.device_put(dev_host), rows,
                         jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-5, err_msg=str(mesh))
    assert got_correct == want_correct, mesh


def test_block_dp_pallas_matches_xla_impl():
    """block_impl="pallas" inside the shard_map'd mesh block loss must
    agree with the xla impl. On the CPU test mesh this pins the documented
    fallback routing (the pallas HLO interpreter cannot run under
    shard_map's vma checker — apply_block routes non-TPU mesh traces to
    the identical XLA formulation); on real TPU meshes the same call runs
    the compiled kernel."""
    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
    )
    from dgcnn_tpu.models.dgcnn import DGCNN, init_params
    from dgcnn_tpu.parallel import make_mesh
    from dgcnn_tpu.parallel.shard import lpt_assign
    from dgcnn_tpu.parallel.train_dp import _make_block_dp_loss

    gs = synthesize_tu_dataset("DD", num_graphs=14, seed=3)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    idx = np.arange(12)
    dev_host = build_block_graphset(gs)
    nb = dev_host.nb.astype(np.int64)
    wc = dev_host.block_count.astype(np.int64)

    n_data = 4
    m = make_mesh((n_data, 2))
    slots = -(-len(idx) // n_data)
    rows = np.full((n_data, slots), -1, np.int32)
    for d, g in enumerate(lpt_assign(wc[idx], n_data, slots)):
        rows[d, : len(g)] = idx[g]
    sbn, sbw = block_batch_extents(nb, wc, rows)
    dev = jax.device_put(dev_host)
    outs = {}
    for impl in ("xla", "pallas"):
        loss_fn = _make_block_dp_loss(
            model, m, max(sbn, 8), max(sbw, 8), True, impl
        )
        outs[impl] = jax.device_get(
            jax.jit(loss_fn)(params, dev, rows, jax.random.PRNGKey(0))
        )
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0], rtol=1e-5)
    assert outs["pallas"][1] == outs["xla"][1]
