"""Block-sparse layout (batching/block_sparse.py + models.apply_block):
build invariants, on-device assembly, logit equality with the COO path,
gradient flow, and engine-level metric equality."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.block_sparse import (
    block_batch_extents,
    build_block_graphset,
    gather_block_batch,
)
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply_block, apply_coo, init_params
import pytest


def _setup(name, ng, seed=3):
    gs = synthesize_tu_dataset(name, num_graphs=ng, seed=seed)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    dev = jax.device_put(build_block_graphset(gs))
    return gs, model, params, dev


def _block_logits(params, model, dev, gs, idx, slots=None):
    idx = np.asarray(idx, np.int32)
    if slots is not None:  # pad with empty slots
        idx = np.concatenate([idx, np.full(slots - len(idx), -1, np.int32)])
    nbb, wb = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count), idx[None, :]
    )
    bb = gather_block_batch(dev, jnp.asarray(idx), nbb, wb)
    return np.asarray(apply_block(params, model, bb, dev.pool))


def test_build_invariants():
    gs, _, _, _ = _setup("DD", 8)
    dev = build_block_graphset(gs)
    g = gs.num_graphs
    # sentinels
    assert dev.nb[g] == 0 and dev.block_count[g] == 0
    assert not np.asarray(dev.pool[-1]).any()
    # per-graph blocks sorted by (row, col); rows/cols inside the grid
    for i in range(g):
        s, c = int(dev.block_start[i]), int(dev.block_count[i])
        r, cc = dev.block_row[s : s + c], dev.block_col[s : s + c]
        assert (np.lexsort((cc, r)) == np.arange(c)).all()
        assert r.max() < dev.nb[i] and cc.max() < dev.nb[i]
        # diagonal blocks all present (self-loops live there)
        have = set(zip(r.tolist(), cc.tolist()))
        assert all((d, d) in have for d in range(int(dev.nb[i])))
    # block pool reconstructs the dense normalized adjacency of graph 0
    n = gs.num_nodes(0)
    bs = dev.pool.shape[1]
    dense = np.zeros((int(dev.nb[0]) * bs, int(dev.nb[0]) * bs), np.float32)
    for j in range(int(dev.block_count[0])):
        r, c = int(dev.block_row[j]), int(dev.block_col[j])
        dense[r * bs : (r + 1) * bs, c * bs : (c + 1) * bs] = dev.pool[j]
    es, ee = gs.edge_ptr[0], gs.edge_ptr[1]
    s, d = gs.edge_src[es:ee], gs.edge_dst[es:ee]
    keep = s != d
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (d[keep], s[keep]), 1.0)
    a += np.eye(n)
    dinv = 1.0 / np.sqrt(a.sum(axis=1))
    want = a * dinv[:, None] * dinv[None, :]
    np.testing.assert_allclose(dense[:n, :n], want, rtol=1e-6, atol=1e-6)
    assert not dense[n:, :].any() and not dense[:, n:].any()


def test_item_rows_sorted_and_padding():
    gs, _, _, dev = _setup("COLLAB", 12)
    idx = np.array([3, 0, 7, -1, -1], np.int32)
    nbb, wb = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count),
        np.arange(12, dtype=np.int32)[None, :],
    )
    bb = gather_block_batch(dev, jnp.asarray(idx), nbb, wb)
    rows = np.asarray(bb.item_row)
    assert (np.diff(rows) >= 0).all()  # sorted fast path is valid
    # padded items hit the zero pool block and the overflow row
    pad = np.asarray(bb.item_pool) == dev.pool.shape[0] - 1
    assert (rows[pad] == nbb).all()
    # node bookkeeping: padded nodes carry the sentinel graph id
    ngr = np.asarray(bb.node_graph)
    nm = np.asarray(bb.node_mask)
    assert ((ngr == 5) == (nm == 0)).all()
    assert int(bb.num_graphs) == 3


@pytest.mark.slow
def test_logits_match_coo_all_shapes():
    for name, ng in (("COLLAB", 16), ("DD", 8), ("MUTAG", 12), ("PROTEINS", 10)):
        gs, model, params, dev = _setup(name, ng)
        coo = pack_batch(gs, np.arange(ng), compute_bucket(gs, ng))
        want = np.asarray(apply_coo(params, model, jax.device_put(coo)))[:ng]
        got = _block_logits(params, model, dev, gs, np.arange(ng))[:ng]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_logits_match_coo_with_empty_slots():
    gs, model, params, dev = _setup("DD", 8)
    idx = np.array([5, 1, 6])
    coo = pack_batch(gs, idx, compute_bucket(gs, 8))
    want = np.asarray(apply_coo(params, model, jax.device_put(coo)))[:3]
    got = _block_logits(params, model, dev, gs, idx, slots=6)[:3]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grads_match_coo_path():
    """The custom VJP of block_propagate (col-major sorted traversal —
    models/dgcnn.py) must reproduce plain autodiff: compare full loss
    gradients against the COO path on the same batch and weights."""
    gs, model, params, dev = _setup("DD", 8)
    ng = 8
    idx = np.arange(ng, dtype=np.int32)
    coo = jax.device_put(pack_batch(gs, idx, compute_bucket(gs, ng)))
    nbb, wb = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count), idx[None, :]
    )
    bb = gather_block_batch(dev, jnp.asarray(idx), nbb, wb)
    y = jnp.asarray(gs.y)

    def loss_coo(p):
        lp = apply_coo(p, model, coo)
        return -(lp[jnp.arange(ng), y]).mean()

    def loss_block(p):
        lp = apply_block(p, model, bb, dev.pool)
        return -(lp[jnp.arange(ng), y]).mean()

    g_coo = jax.grad(loss_coo)(params)
    g_blk = jax.grad(loss_block)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_coo), jax.tree_util.tree_leaves(g_blk)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


@pytest.mark.slow
def test_grads_flow_and_bf16():
    gs, model, params, dev = _setup("COLLAB", 10)
    idx = jnp.arange(10, dtype=jnp.int32)
    nbb, wb = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count),
        np.arange(10, dtype=np.int32)[None, :],
    )
    bb = gather_block_batch(dev, idx, nbb, wb)
    y = jnp.asarray(gs.y)

    def loss(p):
        lp = apply_block(p, model, bb, dev.pool)
        return -(lp[jnp.arange(10), y]).mean()

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0

    bf16 = DGCNN(
        num_features=gs.num_features, num_classes=gs.num_classes,
        compute_dtype="bfloat16",
    )
    lp32 = np.asarray(apply_block(params, model, bb, dev.pool))[:10]
    lp16 = np.asarray(apply_block(params, bf16, bb, dev.pool))[:10]
    assert lp16.dtype == np.float32
    np.testing.assert_allclose(lp16, lp32, atol=0.1, rtol=0.1)


@pytest.mark.slow
def test_engine_matches_coo_engine(tmp_path):
    import os

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("COLLAB", num_graphs=40, seed=5)
    base = dict(
        data_type="COLLAB", batch_size=8, num_epochs=3, num_folds=2,
        xla_cache_dir="",
    )
    results = {}
    for layout in ("block", "coo"):
        cfg = Config(
            layout=layout,
            epochs_dir=os.path.join(tmp_path, layout, "e"),
            statistics_dir=os.path.join(tmp_path, layout, "s"),
            **base,
        )
        results[layout] = run_cross_validation(cfg, dataset=gs)
    np.testing.assert_allclose(
        results["block"]["test_accuracies"], results["coo"]["test_accuracies"]
    )
    np.testing.assert_allclose(
        results["block"]["train_accuracies"], results["coo"]["train_accuracies"]
    )


def test_chunked_propagate_matches_unchunked():
    """block_propagate_chunked (traced-trip fori_loop over 256-item
    chunks — the production XLA path) must reproduce the one-shot
    formulation on arbitrary budgets: at a chunk boundary, mid-chunk,
    under heavy padding (budget >> real items), and for an empty batch.
    Forward AND the custom-VJP backward (d_hb) are compared."""
    import jax.numpy as jnp

    from dgcnn_tpu.models.dgcnn import (
        _PROP_CHUNK,
        block_propagate,
        block_propagate_chunked,
    )

    gs, model, params, dev = _setup("DD", 10)
    rng = np.random.default_rng(4)

    for idx, w_extra in (
        (np.arange(10, dtype=np.int32), 0),       # natural budget
        (np.arange(6, dtype=np.int32), 700),      # heavy padding
        (np.array([2], dtype=np.int32), 0),       # single graph
        (np.array([-1], dtype=np.int32), 64),     # EMPTY batch
    ):
        nbb, wb = block_batch_extents(
            np.asarray(dev.nb), np.asarray(dev.block_count),
            np.maximum(idx, -1)[None, :],
        )
        nbb, wb = max(nbb, 2), max(wb + w_extra, 64)
        bb = gather_block_batch(dev, jnp.asarray(idx), nbb, wb)
        f = 16
        hb = jnp.asarray(
            rng.normal(size=(nbb, 128, f)).astype(np.float32) * 0.1
        )
        blocks = dev.pool[bb.item_pool]

        want = block_propagate(
            hb, blocks, bb.item_row, bb.item_col, bb.item_permT, bb.item_colT
        )
        got = block_propagate_chunked(
            hb, dev.pool, bb.item_pool, bb.item_row, bb.item_col,
            bb.item_permT, bb.item_colT, bb.num_items,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )

        # real-count sanity: the traced trip count covers every item
        assert int(bb.num_items) <= wb
        if idx[0] >= 0:
            assert int(bb.num_items) > 0
        else:
            assert int(bb.num_items) == 0

        def loss_unchunked(h):
            return (block_propagate(
                h, blocks, bb.item_row, bb.item_col, bb.item_permT,
                bb.item_colT,
            ) ** 2).sum()

        def loss_chunked(h):
            return (block_propagate_chunked(
                h, dev.pool, bb.item_pool, bb.item_row, bb.item_col,
                bb.item_permT, bb.item_colT, bb.num_items,
            ) ** 2).sum()

        g_want = jax.grad(loss_unchunked)(hb)
        g_got = jax.grad(loss_chunked)(hb)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=1e-5, atol=1e-6
        )


def test_gather_block_batch_folds_matches_per_fold():
    """The merged f-major stream must contain exactly each fold's
    gather_block_batch items (same pool ids, rows/cols rebased by the
    fold offsets), packed contiguously in fold order, and the node-side
    arrays must equal the per-fold gathers."""
    import jax

    from dgcnn_tpu.batching.block_sparse import (
        block_fold_extents,
        gather_block_batch,
        gather_block_batch_folds,
        build_block_graphset,
    )

    gs = synthesize_tu_dataset("PROTEINS", num_graphs=30, seed=3)
    dev = jax.device_put(build_block_graphset(gs))
    rng = np.random.default_rng(0)
    F, slots = 3, 8
    idx = np.full((F, slots), -1, np.int32)
    for f in range(F):
        take = rng.integers(3, slots + 1)
        idx[f, :take] = rng.choice(gs.num_graphs, take, replace=False)
    nb_b, w_b = block_fold_extents(
        dev.nb, dev.block_count, idx
    )
    nb_b, w_b = int(nb_b) + 8, F * (int(w_b) + 8)

    fb = gather_block_batch_folds(dev, jnp.asarray(idx), nb_b, w_b)
    sp1 = nb_b + 1
    off = 0
    for f in range(F):
        b = gather_block_batch(dev, jnp.asarray(idx[f]), nb_b, w_b // F)
        n_items = int(b.num_items)
        sl = slice(off, off + n_items)
        np.testing.assert_array_equal(
            np.asarray(fb.item_pool[sl]), np.asarray(b.item_pool[:n_items])
        )
        np.testing.assert_array_equal(
            np.asarray(fb.item_rowseg[sl]),
            f * sp1 + np.asarray(b.item_row[:n_items]),
        )
        np.testing.assert_array_equal(
            np.asarray(fb.item_colsrc[sl]),
            f * nb_b + np.asarray(b.item_col[:n_items]),
        )
        # the flat col-major traversal maps this fold's items onto the
        # same in-fold permutation, shifted by the fold's stream offset
        np.testing.assert_array_equal(
            np.asarray(fb.item_permT[sl]),
            off + np.asarray(b.item_permT[:n_items]),
        )
        np.testing.assert_array_equal(
            np.asarray(fb.item_colTseg[sl]),
            f * sp1 + np.asarray(b.item_colT[:n_items]),
        )
        off += n_items
        np.testing.assert_array_equal(
            np.asarray(fb.x[f]), np.asarray(b.x)
        )
        np.testing.assert_array_equal(
            np.asarray(fb.node_graph[f]), np.asarray(b.node_graph)
        )
        np.testing.assert_array_equal(
            np.asarray(fb.y[f]), np.asarray(b.y)
        )
    assert int(fb.num_items) == off
    # padded tail: sentinel pool (zero block), dropped segment ids
    tail = np.asarray(fb.item_pool[off:])
    assert (tail == dev.pool.shape[0] - 1).all()
    assert (np.asarray(fb.item_rowseg[off:]) == F * sp1).all()
