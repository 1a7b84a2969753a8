"""Device-resident COO assembly: bit-equality with the host packer, and
engine-level equality with the host-packing COO engine."""

import dataclasses

import jax
import numpy as np
import optax
import pytest

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.device_coo import (
    build_device_graphset,
    device_graphset_bytes,
    gather_coo_batch,
)
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, init_params


@pytest.mark.parametrize("name", ["MUTAG", "DD", "IMDB-BINARY"])
def test_gather_matches_host_packer(name):
    gs = synthesize_tu_dataset(name, num_graphs=20, seed=11)
    bucket = compute_bucket(gs, 6, node_multiple=128, edge_multiple=128,
                            graph_multiple=2)
    dev = jax.device_put(build_device_graphset(gs))

    for idx in ([3, 11, 7], [0], list(range(6))):
        idx_row = np.full(bucket.num_graphs, -1, np.int32)
        idx_row[: len(idx)] = idx
        got = jax.jit(
            lambda d, r: gather_coo_batch(d, r, bucket)
        )(dev, idx_row)
        want = pack_batch(gs, idx, bucket)
        for f in dataclasses.fields(want):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f.name)),
                getattr(want, f.name),
                err_msg=f"{name} idx={idx} field={f.name}",
            )


def test_gather_with_self_loops_stripped():
    from dgcnn_tpu.data.graphset import GraphSet
    from dgcnn_tpu.batching import BucketSpec

    node_ptr = np.array([0, 3], np.int64)
    gs = GraphSet(
        np.ones((3, 2), np.float32), node_ptr,
        np.array([0, 1, 1], np.int32), np.array([1, 0, 1], np.int32),
        np.array([0, 3], np.int64), np.array([0], np.int32), 2,
    )
    bucket = BucketSpec(128, 128, 2)
    dev = jax.device_put(build_device_graphset(gs))
    idx_row = np.array([0, -1], np.int32)
    got = gather_coo_batch(dev, idx_row, bucket)
    assert int(np.asarray(got.edge_mask).sum()) == 2  # self-loop 1→1 gone
    want = pack_batch(gs, [0], bucket)
    np.testing.assert_array_equal(np.asarray(got.edge_src), want.edge_src)
    np.testing.assert_array_equal(np.asarray(got.edge_dst), want.edge_dst)


def test_device_coo_engine_equals_host_engine():
    """DeviceCooEngine must train identically to the host-packing
    CooEngine (same batches → same floats)."""
    from dgcnn_tpu.train.cv import CooEngine, DeviceCooEngine

    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=4)
    kw = dict(
        data_type="MUTAG", batch_size=8,
        node_pad_multiple=64, edge_pad_multiple=128, graph_pad_multiple=4,
    )
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    optimizer = optax.adam(1e-3)
    host = CooEngine(Config(coo_assembly="host", **kw), gs, model, optimizer)
    dev = DeviceCooEngine(Config(**kw), gs, model, optimizer)
    for e in (host, dev):
        e.begin_fold(np.arange(24), np.arange(24, 30))

    perms = np.stack([np.random.default_rng(e).permutation(24) for e in range(3)])
    p0 = init_params(jax.random.PRNGKey(0), model)
    s0 = optimizer.init(p0)
    k0 = jax.random.PRNGKey(7)

    ph, _, _, rows_h = host.run_epochs(p0, s0, k0, perms)
    pd, _, _, rows_d = dev.run_epochs(p0, s0, k0, perms)
    np.testing.assert_allclose(rows_d, rows_h, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pd), jax.tree_util.tree_leaves(ph)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_device_graphset_bytes_sane():
    gs = synthesize_tu_dataset("DD", num_graphs=40, seed=2)
    est = device_graphset_bytes(gs)
    dev = build_device_graphset(gs)
    actual = sum(a.nbytes for a in jax.tree_util.tree_leaves(dev))
    assert abs(actual - est) / est < 0.05


@pytest.mark.parametrize("name", ["MUTAG", "DD"])
def test_densify_on_device_matches_host_builder(name):
    """On-device dense materialization == host build_dense_dataset."""
    import jax.tree_util as jtu

    from dgcnn_tpu.batching.dense import (
        build_dense_dataset,
        build_dense_dataset_on_device,
        dense_tile,
    )

    gs = synthesize_tu_dataset(name, num_graphs=12, seed=6)
    n_tile = dense_tile(gs)
    want = build_dense_dataset(gs, n_tile)
    got = build_dense_dataset_on_device(gs, n_tile)
    for w, g in zip(jtu.tree_leaves(want), jtu.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-7)


def test_multi_dense_device_build_matches_host():
    import jax.tree_util as jtu

    from dgcnn_tpu.batching.multi_dense import (
        build_multi_dense,
        build_multi_dense_on_device,
        plan_tiles,
    )

    gs = synthesize_tu_dataset("DD", num_graphs=16, seed=2)
    tiles = plan_tiles(gs.node_counts(), 256)
    want, r1 = build_multi_dense(gs, tiles)
    got, r2 = build_multi_dense_on_device(gs, tiles)
    assert r1.tiles == r2.tiles
    np.testing.assert_array_equal(r1.class_of, r2.class_of)
    for w, g in zip(jtu.tree_leaves(want), jtu.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6, atol=1e-7)
