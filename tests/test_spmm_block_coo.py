"""Block-pair COO SpMM kernel (kernels/spmm_block_coo.py) vs the XLA
segment-sum oracle: forward equality, gradients, structure builder
invariants, batch-realistic structures. Interpret mode on the CPU test
backend; real-TPU compiled-path equality is pinned by
tools/profile_step.py's A/B (see bench.py spmm rows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.spmm_block_coo import (
    BS,
    BlockCOO,
    block_coo_fits,
    build_block_coo,
    pad_weights,
    pad_weights_t,
    spmm_block_coo,
)
from dgcnn_tpu.ops.spmm import spmm_xla


def _random_edges(rng, n, e):
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = (rng.random(e).astype(np.float32) - 0.5) * 0.1
    return src, dst, w


def _batchlike_edges(rng, n, graphs, avg_nodes):
    """Block-diagonal-ish edges: contiguous graphs, intra-graph random
    edges — the structure real packed mega-batches have."""
    src_l, dst_l = [], []
    base = 0
    for _ in range(graphs):
        gn = max(2, int(rng.normal(avg_nodes, avg_nodes * 0.3)))
        gn = min(gn, n - base)
        if gn < 2:
            break
        ge = gn * 3
        s = rng.integers(0, gn, ge) + base
        d = rng.integers(0, gn, ge) + base
        src_l.append(s)
        dst_l.append(d)
        base += gn
        if base >= n:
            break
    src = np.concatenate(src_l).astype(np.int32)
    dst = np.concatenate(dst_l).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    w = (rng.random(src.shape[0]).astype(np.float32) - 0.5) * 0.1
    return src[order], dst[order], w


@pytest.mark.parametrize("structure_kind", ["random", "batch"])
@pytest.mark.parametrize("f", [32, 97, 1])
def test_forward_matches_xla(structure_kind, f):
    rng = np.random.default_rng(0)
    n = 512
    if structure_kind == "random":
        src, dst, w = _random_edges(rng, n, 2048)
    else:
        src, dst, w = _batchlike_edges(rng, n, 12, 30)
    h = rng.normal(size=(n, f)).astype(np.float32) * 0.1

    structure = build_block_coo(src, dst, n, eb=128)
    w_pad = jnp.asarray(pad_weights(structure, w))
    w_padT = jnp.asarray(pad_weights_t(structure, w))

    got = spmm_block_coo(structure, w_pad, w_padT, jnp.asarray(h), True)
    want = spmm_xla(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), jnp.asarray(h), n
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_builder_invariants():
    rng = np.random.default_rng(1)
    n = 384
    src, dst, w = _batchlike_edges(rng, n, 8, 25)
    s = build_block_coo(src, dst, n, eb=128)

    nb = n // BS
    rp = np.asarray(s.row_ptr)
    assert rp.shape == (nb + 1,)
    assert rp[0] == 0 and rp[-1] == np.asarray(s.item_r).shape[0]
    assert np.all(np.diff(rp) >= 0)
    # every real slot's reconstructed global indices match the originals
    perm = np.asarray(s.perm)
    real = perm >= 0
    gsrc = np.asarray(s.item_c)[:, None] * BS + np.asarray(s.ls)
    gdst = np.asarray(s.item_r)[:, None] * BS + np.asarray(s.ld)
    np.testing.assert_array_equal(gsrc[real], src[perm[real]])
    np.testing.assert_array_equal(gdst[real], dst[perm[real]])
    # each real edge appears in exactly one slot
    assert np.array_equal(np.sort(perm[real]), np.arange(src.shape[0]))
    # fill fraction consistent
    assert s.meta.fill == pytest.approx(src.shape[0] / perm.size)


def test_gradients_match_xla():
    rng = np.random.default_rng(2)
    n = 256
    src, dst, w = _batchlike_edges(rng, n, 6, 25)
    h = rng.normal(size=(n, 16)).astype(np.float32) * 0.1
    structure = build_block_coo(src, dst, n, eb=128)
    w_pad = jnp.asarray(pad_weights(structure, w))
    w_padT = jnp.asarray(pad_weights_t(structure, w))
    g = rng.normal(size=(n, 16)).astype(np.float32)

    def ours(wp, hh):
        out = spmm_block_coo(structure, wp, w_padT, hh, True)
        return jnp.vdot(out, jnp.asarray(g))

    def ref(ww, hh):
        out = spmm_xla(jnp.asarray(src), jnp.asarray(dst), ww, hh, n)
        return jnp.vdot(out, jnp.asarray(g))

    dwp, dh = jax.grad(ours, argnums=(0, 1))(w_pad, jnp.asarray(h))
    dw_ref, dh_ref = jax.grad(ref, argnums=(0, 1))(
        jnp.asarray(w), jnp.asarray(h)
    )
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=1e-5, atol=1e-5)
    # slot-order dw back to edge order via perm
    perm = np.asarray(structure.perm)
    real = perm >= 0
    dw_edges = np.zeros_like(np.asarray(w))
    dw_edges[perm[real]] = np.asarray(dwp)[real]
    np.testing.assert_allclose(dw_edges, np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


def test_empty_and_single_edge():
    n = 256
    h = np.ones((n, 8), np.float32)
    # single edge
    s = build_block_coo(np.array([3]), np.array([200]), n, eb=128)
    wp = jnp.asarray(pad_weights(s, np.array([2.0], np.float32)))
    wpT = jnp.asarray(pad_weights_t(s, np.array([2.0], np.float32)))
    out = np.asarray(spmm_block_coo(s, wp, wpT, jnp.asarray(h), True))
    want = np.zeros((n, 8), np.float32)
    want[200] = 2.0
    np.testing.assert_allclose(out, want, atol=1e-6)
    # no edges at all
    s0 = build_block_coo(np.zeros(0, np.int32), np.zeros(0, np.int32), n)
    wp0 = jnp.asarray(pad_weights(s0, np.zeros(0, np.float32)))
    out0 = np.asarray(spmm_block_coo(s0, wp0, wp0, jnp.asarray(h), True))
    np.testing.assert_array_equal(out0, np.zeros((n, 8), np.float32))


def test_fits_gate():
    assert block_coo_fits(2048, 32, 64, 256)
    assert not block_coo_fits(200_000, 128, 4096, 256)


def test_pad_structure_preserves_result():
    rng = np.random.default_rng(4)
    n = 256
    src, dst, w = _batchlike_edges(rng, n, 6, 25)
    h = rng.normal(size=(n, 8)).astype(np.float32)
    s = build_block_coo(src, dst, n, eb=128)
    sp = __import__(
        "dgcnn_tpu.kernels.spmm_block_coo", fromlist=["pad_structure"]
    ).pad_structure(s, s.ls.shape[0] + 5)
    for st in (s, sp):
        wp = jnp.asarray(pad_weights(st, w))
        wpT = jnp.asarray(pad_weights_t(st, w))
        out = np.asarray(spmm_block_coo(st, wp, wpT, jnp.asarray(h), True))
        want = np.asarray(
            spmm_xla(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                     jnp.asarray(h), n)
        )
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_apply_coo_with_blockcoo_matches_plain():
    """Full-model equality: the packer's add_blockcoo structure routed
    through spmm_impl='pallas' (interpret mode on CPU) vs the plain XLA
    path — logits identical on a packed synthetic batch."""
    from dgcnn_tpu.batching import compute_bucket, pack_batch
    from dgcnn_tpu.batching.packer import add_blockcoo
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_coo, init_params

    gs = synthesize_tu_dataset("MUTAG", num_graphs=10, seed=6)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    batch = pack_batch(gs, np.arange(10), compute_bucket(gs, 10))
    batch_bc = add_blockcoo(batch, eb=128)
    assert batch_bc.blockcoo is not None

    want = apply_coo(params, model, batch, spmm_impl="xla")
    got = apply_coo(params, model, batch_bc, spmm_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_add_blockcoo_stacked_epoch():
    """add_blockcoo on a STACKED epoch: per-batch structures pad to one
    item count and per-step slices reproduce the per-batch result."""
    from dgcnn_tpu.batching import compute_bucket
    from dgcnn_tpu.batching.packer import add_blockcoo, pack_epoch
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset

    gs = synthesize_tu_dataset("MUTAG", num_graphs=12, seed=7)
    bucket = compute_bucket(gs, 4)
    epoch = pack_epoch(gs, np.arange(12), 4, bucket)
    epoch_bc = add_blockcoo(epoch, eb=128)
    structure, w_pad, w_padT = epoch_bc.blockcoo
    nb = bucket.num_nodes // BS
    n_batches = epoch.x.shape[0]
    assert structure.ls.shape[0] == n_batches
    assert w_pad.shape[0] == n_batches

    rng = np.random.default_rng(0)
    h = rng.normal(size=(bucket.num_nodes, 8)).astype(np.float32)
    for b in range(n_batches):
        sl = jax.tree_util.tree_map(lambda a: a[b], structure)
        out = np.asarray(
            spmm_block_coo(sl, w_pad[b], w_padT[b], jnp.asarray(h), True)
        )
        real = np.asarray(epoch.edge_mask[b]) > 0
        want = np.asarray(
            spmm_xla(
                jnp.asarray(epoch.edge_src[b][real]),
                jnp.asarray(epoch.edge_dst[b][real]),
                jnp.asarray(epoch.edge_mask[b][real]),
                jnp.asarray(h),
                bucket.num_nodes,
            )
        )
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
