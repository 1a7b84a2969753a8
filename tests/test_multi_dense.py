"""Multi-tile dense layout: routing, logit equality with the COO path,
and engine-level equality / trainability on a heavy-tailed dataset."""

import jax
import numpy as np
import optax
import pytest

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.dense import gather_dense_batch
from dgcnn_tpu.batching.multi_dense import (
    build_multi_dense,
    build_routing,
    multi_dense_bytes,
    plan_tiles,
    route_order_rows,
)
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, apply_multi_dense, init_params
from dgcnn_tpu.train.cv import choose_layout, run_cross_validation


def _dd_like(n=24, seed=3):
    return synthesize_tu_dataset("DD", num_graphs=n, seed=seed)


def test_plan_tiles_and_routing():
    nc = np.array([10, 100, 300, 600, 1500, 3000])
    tiles = plan_tiles(nc, min_tile=256)
    assert tiles[0] == 256 and tiles[-1] >= 3000
    r = build_routing(nc, tiles)
    for n, c in zip(nc, r.class_of):
        assert n <= r.tiles[c]
        assert c == 0 or n > r.tiles[c - 1]
    # index_in_class enumerates members per class
    for c in range(len(r.tiles)):
        members = np.flatnonzero(r.class_of == c)
        np.testing.assert_array_equal(
            r.index_in_class[members], np.arange(len(members))
        )


@pytest.mark.slow
def test_build_on_device_with_empty_tile_class():
    """A caller-chosen ladder may leave a bracket with zero graphs; the
    device build (incl. its fence) must produce an empty class, matching
    the host builder."""
    from dgcnn_tpu.batching.multi_dense import (
        build_multi_dense_on_device,
    )

    gs = _dd_like(n=10)
    nc = gs.node_counts()
    # bracket between min and max chosen so no graph lands in it
    lo = int(nc.min())
    tiles = (lo, lo + 1, int(nc.max()))
    assert not ((nc > lo) & (nc <= lo + 1)).any()
    classes, routing = build_multi_dense_on_device(gs, tiles)
    host_classes, host_routing = build_multi_dense(gs, tiles)
    assert classes[1].adj.shape[0] == 0
    for dev_c, host_c in zip(classes, host_classes):
        np.testing.assert_allclose(
            np.asarray(dev_c.adj), host_c.adj, rtol=1e-6, atol=1e-7
        )


def test_route_order_rows_overflow():
    nc = np.array([10, 20, 30])
    tiles = plan_tiles(nc, min_tile=256)
    r = build_routing(nc, tiles)
    with pytest.raises(ValueError, match="slots"):
        route_order_rows(r, np.array([0, 1, 2]), [2])


@pytest.mark.slow
def test_multi_dense_logits_match_coo():
    gs = _dd_like()
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    ids = np.arange(12)

    # COO reference
    coo = apply(
        params, model,
        jax.device_put(pack_batch(gs, ids, compute_bucket(gs, 12))),
    )
    want = np.asarray(coo)[:12]

    tiles = plan_tiles(gs.node_counts(), min_tile=256)
    classes, routing = build_multi_dense(gs, tiles)
    classes = jax.device_put(classes)
    slots = [8] * len(tiles)
    rows = route_order_rows(routing, ids, slots)
    batches = tuple(
        gather_dense_batch(d, jax.device_put(r)) for d, r in zip(classes, rows)
    )
    lp, y, gm = apply_multi_dense(params, model, batches)
    lp, y, gm = np.asarray(lp), np.asarray(y), np.asarray(gm)

    # concat slot order = per class, members in ids order
    order = np.concatenate(
        [ids[routing.class_of[ids] == c] for c in range(len(tiles))]
    )
    got = lp[gm > 0]
    np.testing.assert_array_equal(y[gm > 0], gs.y[order])
    np.testing.assert_allclose(got, want[order], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_multi_engine_matches_device_coo_engine():
    """No-dropout model → identical per-epoch rows between the multi-tile
    dense engine and the device-COO engine (same batches, same updates)."""
    from dgcnn_tpu.train.cv import DeviceCooEngine, MultiDenseEngine

    gs = _dd_like(n=30, seed=7)
    kw = dict(data_type="DD", batch_size=8, dropout_rate=0.0,
              node_pad_multiple=64, edge_pad_multiple=128,
              graph_pad_multiple=4)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes,
                  dropout_rate=0.0)
    optimizer = optax.adam(1e-3)
    e_coo = DeviceCooEngine(Config(**kw), gs, model, optimizer)
    e_multi = MultiDenseEngine(Config(**kw), gs, model, optimizer)
    for e in (e_coo, e_multi):
        e.begin_fold(np.arange(24), np.arange(24, 30))

    perms = np.stack([np.random.default_rng(i).permutation(24) for i in range(3)])
    p0 = init_params(jax.random.PRNGKey(0), model)
    s0 = optimizer.init(p0)
    k0 = jax.random.PRNGKey(7)
    pa, _, _, rows_a = e_coo.run_epochs(p0, s0, k0, perms)
    pb, _, _, rows_b = e_multi.run_epochs(p0, s0, k0, perms)
    np.testing.assert_allclose(rows_b, rows_a, rtol=5e-4, atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5)


def test_auto_layout_picks_block_for_heavy_tail():
    gs = synthesize_tu_dataset("DD", num_graphs=60, seed=1)
    cfg = Config(data_type="DD")
    # heavy-tailed datasets route to the block-sparse engine (2.1× the
    # multi-tile engine's fp32 epoch time on D&D); multi stays explicit
    assert choose_layout(cfg, gs) == "block"
    assert choose_layout(Config(data_type="DD", layout="multi"), gs) == "multi"
    assert multi_dense_bytes(gs, plan_tiles(gs.node_counts(), 256)) > 0


def test_auto_layout_demotes_padding_wasteful_dense_to_multi():
    """COLLAB regime (measured on-chip 2026-08-19: multi 20.5 ms vs dense
    35.7): a dataset whose dense tile dwarfs its typical graph AND whose
    10-fold stack exceeds the lockstep budget resolves to multi; the same
    dataset stays dense whenever fold-lockstep can engage (NCI1 regime:
    lockstep dense 6.0 ms/fold-epoch steady-state vs multi 14.8)."""
    gs = synthesize_tu_dataset("COLLAB", num_graphs=500, seed=2)
    assert choose_layout(Config(data_type="COLLAB"), gs) == "multi"
    # raising the lockstep budget flips it back to (lockstep) dense
    big = Config(data_type="COLLAB", lockstep_max_step_bytes=1 << 40)
    assert choose_layout(big, gs) == "dense"
    # explicit lockstep request is dense-only — never demoted
    folds = Config(data_type="COLLAB", cv_parallel="folds")
    assert choose_layout(folds, gs) == "dense"
    # a fold-shardable (D, 1) mesh CAN resolve to multi (fold-lockstep
    # runs it sharded over the data axis); a graph-axis mesh cannot
    mesh = Config(data_type="COLLAB", mesh_shape=(2, 1))
    assert choose_layout(mesh, gs) == "multi"
    mesh_g = Config(data_type="COLLAB", mesh_shape=(2, 2))
    assert choose_layout(mesh_g, gs) == "dense"


@pytest.mark.slow
def test_multi_cv_runs_and_learns(tmp_path):
    gs = _dd_like(n=40, seed=5)
    cfg = Config(
        data_type="DD", batch_size=16, num_epochs=8, num_folds=2,
        layout="multi",
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
    )
    result = run_cross_validation(cfg, dataset=gs)
    assert len(result["test_accuracies"]) == 2
    assert result["train_accuracy_mean"] > 60.0


def test_build_routing_rejects_uncovered_graphs():
    """Graphs larger than the top tile must raise, not silently vanish
    from every batch."""
    import pytest

    from dgcnn_tpu.batching.multi_dense import build_routing

    with pytest.raises(ValueError, match="tiles must cover"):
        build_routing(np.array([100, 600]), (256, 512))
