"""Op-level golden tests vs the dense NumPy oracle (SURVEY §4 item 1):
gcn_norm/gcn_conv vs dense-matrix reference, SpMM vs dense, SortPooling
edge cases (<k nodes, >k nodes, exact ties, padding exclusion)."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.batching import BucketSpec, pack_batch
from dgcnn_tpu.data.graphset import GraphSet
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.ops import gcn_conv, gcn_degree, gcn_edge_weights, sort_pool, spmm
from oracle import gcn_layer_dense, sort_pool_single


def _single_graph_batch(x, edges, num_nodes_pad=32, num_edges_pad=64):
    n = x.shape[0]
    gs = GraphSet(
        x=x.astype(np.float32),
        node_ptr=np.array([0, n], np.int64),
        edge_src=edges[:, 0].astype(np.int32),
        edge_dst=edges[:, 1].astype(np.int32),
        edge_ptr=np.array([0, len(edges)], np.int64),
        y=np.array([0], np.int32),
        num_classes=2,
    )
    bucket = BucketSpec(num_nodes_pad, num_edges_pad, 4)
    return pack_batch(gs, [0], bucket)


def test_spmm_matches_dense():
    rng = np.random.default_rng(0)
    n, e, f = 20, 60, 7
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    h = rng.normal(size=(n, f)).astype(np.float32)

    out = spmm(jnp.array(src), jnp.array(dst), jnp.array(w), jnp.array(h), n)
    dense = np.zeros((n, n), np.float64)
    for s, d, wt in zip(src, dst, w):
        dense[d, s] += wt
    np.testing.assert_allclose(np.asarray(out), dense @ h, rtol=1e-5, atol=1e-5)


def test_gcn_conv_matches_dense_oracle():
    rng = np.random.default_rng(1)
    n, f, out_dim = 9, 5, 4
    x = rng.normal(size=(n, f)).astype(np.float32)
    # undirected edge set, no self-loops, includes an isolated node (8)
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (2, 6)]
    edges = np.array(und + [(b, a) for a, b in und], np.int64)
    w = rng.normal(size=(f, out_dim)).astype(np.float32)
    b = rng.normal(size=(out_dim,)).astype(np.float32)

    batch = _single_graph_batch(x, edges)
    deg = gcn_degree(jnp.array(batch.edge_dst), jnp.array(batch.edge_mask), 32)
    ew = gcn_edge_weights(
        jnp.array(batch.edge_src), jnp.array(batch.edge_dst),
        jnp.array(batch.edge_mask), deg,
    )
    got = gcn_conv(
        jnp.array(batch.x), jnp.array(w), jnp.array(b),
        jnp.array(batch.edge_src), jnp.array(batch.edge_dst), ew, deg,
    )
    want = gcn_layer_dense(x, edges, w, b)
    np.testing.assert_allclose(np.asarray(got)[:n], want, rtol=1e-5, atol=1e-5)


def test_gcn_isolated_node_self_loop_only():
    """An isolated node's output must equal its own features through the
    self-loop with d̂=1 (PyG GCNConv add_self_loops semantics)."""
    x = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    edges = np.zeros((0, 2), np.int64)
    w = np.eye(2, dtype=np.float32)
    b = np.zeros(2, np.float32)
    batch = _single_graph_batch(x, edges)
    deg = gcn_degree(jnp.array(batch.edge_dst), jnp.array(batch.edge_mask), 32)
    ew = gcn_edge_weights(
        jnp.array(batch.edge_src), jnp.array(batch.edge_dst),
        jnp.array(batch.edge_mask), deg,
    )
    got = gcn_conv(
        jnp.array(batch.x), jnp.array(w), jnp.array(b),
        jnp.array(batch.edge_src), jnp.array(batch.edge_dst), ew, deg,
    )
    np.testing.assert_allclose(np.asarray(got)[:2], x, rtol=1e-6)


def _pool_case(xs, k=3):
    """Pack several small graphs' features and sort-pool them."""
    counts = [len(x) for x in xs]
    n_pad = 16
    node_graph = np.full(n_pad, len(xs), np.int32)
    feat = np.zeros((n_pad, xs[0].shape[1]), np.float32)
    off = 0
    for i, x in enumerate(xs):
        feat[off : off + len(x)] = x
        node_graph[off : off + len(x)] = i
        off += len(x)
    out = sort_pool(jnp.array(feat), jnp.array(node_graph), len(xs), k)
    return np.asarray(out)


def test_sort_pool_matches_oracle():
    rng = np.random.default_rng(3)
    xs = [rng.normal(size=(n, 4)).astype(np.float32) for n in (5, 2, 7)]
    got = _pool_case(xs, k=3)
    for i, x in enumerate(xs):
        np.testing.assert_allclose(got[i], sort_pool_single(x, 3), rtol=1e-6)


def test_sort_pool_fewer_than_k_zero_pads():
    x = np.array([[1.0, 0.5], [2.0, -0.3]], np.float32)
    got = _pool_case([x], k=4)
    np.testing.assert_allclose(got[0, :2], sort_pool_single(x, 4)[:2], rtol=1e-6)
    assert (got[0, 2:] == 0).all()


def test_sort_pool_ties_keep_node_order():
    """Equal sort keys: PyG's stable sort keeps original node order
    (SURVEY §2c row 2)."""
    x = np.array(
        [[10.0, 1.0], [20.0, 1.0], [30.0, 1.0], [40.0, 1.0]], np.float32
    )
    got = _pool_case([x], k=4)
    np.testing.assert_allclose(got[0], x)  # untouched order under full tie


def test_sort_pool_excludes_padding():
    """Padded nodes (graph id == num_slots) never enter any graph's top-k,
    even with maximal keys."""
    n_pad = 8
    feat = np.full((n_pad, 2), 99.0, np.float32)  # padding rows scream 99
    feat[:2] = [[1.0, 0.1], [2.0, 0.2]]
    node_graph = np.full(n_pad, 1, np.int32)
    node_graph[:2] = 0
    out = np.asarray(sort_pool(jnp.array(feat), jnp.array(node_graph), 1, 4))
    np.testing.assert_allclose(out[0, 0], [2.0, 0.2])
    np.testing.assert_allclose(out[0, 1], [1.0, 0.1])
    assert (out[0, 2:] == 0).all()


def test_sort_pool_jit_and_grad():
    """Must be jittable and differentiable (flows gradients to kept rows)."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=6, seed=4)
    from dgcnn_tpu.batching import compute_bucket, pack_batch

    bucket = compute_bucket(gs, 6)
    b = pack_batch(gs, np.arange(6), bucket)

    @jax.jit
    def f(x):
        return sort_pool(x, jnp.array(b.node_graph), bucket.num_graphs, 5).sum()

    g = jax.grad(f)(jnp.array(b.x))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_gather_bincount_onehot_match_references():
    """The one-hot gather/bincount helpers (used by gcn_degree /
    gcn_edge_weights under impl=auto — TPU scatter/gather is ~60
    cycles/element) must equal jnp.take / segment_sum exactly."""
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.spmm import bincount_onehot, gather_onehot

    rng = np.random.default_rng(0)
    n, e = 300, 2048
    ids = rng.integers(0, n, e).astype(np.int32)
    vec = rng.normal(size=n).astype(np.float32)
    w = rng.random(e).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gather_onehot(jnp.array(vec), jnp.array(ids))),
        vec[ids], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bincount_onehot(jnp.array(ids), jnp.array(w), n)),
        np.bincount(ids, weights=w, minlength=n).astype(np.float32),
        rtol=1e-5, atol=1e-5)


def test_gcn_norm_onehot_impl_matches_xla():
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.gcn import gcn_degree, gcn_edge_weights

    rng = np.random.default_rng(1)
    n, e = 256, 1024
    dst = jnp.array(np.sort(rng.integers(0, n, e)).astype(np.int32))
    src = jnp.array(rng.integers(0, n, e).astype(np.int32))
    mask = jnp.array((rng.random(e) > 0.1).astype(np.float32))
    d_x = gcn_degree(dst, mask, n, impl="xla")
    d_o = gcn_degree(dst, mask, n, impl="onehot")
    np.testing.assert_allclose(np.asarray(d_o), np.asarray(d_x), rtol=1e-6)
    w_x = gcn_edge_weights(src, dst, mask, d_x, impl="xla")
    w_o = gcn_edge_weights(src, dst, mask, d_x, impl="onehot")
    np.testing.assert_allclose(np.asarray(w_o), np.asarray(w_x), rtol=1e-6)


def test_spmm_onehot_matches_xla_and_grads():
    """The one-hot MXU SpMM formulation == segment-sum SpMM, values and
    gradients (reduction order differs → allclose, not bitwise)."""
    from dgcnn_tpu.ops.spmm import spmm_onehot, spmm_xla

    rng = np.random.default_rng(3)
    n, e, f = 96, 2048, 32
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    w[e // 2 :] = 0.0  # padded tail
    h = rng.normal(size=(n, f)).astype(np.float32)

    args = (jnp.array(src), jnp.array(dst), jnp.array(w), jnp.array(h))
    want = spmm_xla(*args, n)
    got = jax.jit(lambda *a: spmm_onehot(*a, n, block=1024))(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, wv, hv):
        return fn(jnp.array(src), jnp.array(dst), wv, hv, n).sum()

    gw_x, gh_x = jax.grad(lambda wv, hv: loss(spmm_xla, wv, hv), (0, 1))(
        jnp.array(w), jnp.array(h))
    gw_o, gh_o = jax.grad(lambda wv, hv: loss(spmm_onehot, wv, hv), (0, 1))(
        jnp.array(w), jnp.array(h))
    np.testing.assert_allclose(np.asarray(gw_o), np.asarray(gw_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_o), np.asarray(gh_x), rtol=1e-5, atol=1e-5)


def test_spmm_auto_dispatch():
    """auto → onehot for small N·F with 1024-aligned edges, xla otherwise;
    both produce the segment-sum result."""
    rng = np.random.default_rng(4)
    for n, e in ((64, 1024), (64, 100)):  # aligned vs unaligned edges
        src = rng.integers(0, n, e).astype(np.int32)
        dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
        w = rng.normal(size=e).astype(np.float32)
        h = rng.normal(size=(n, 8)).astype(np.float32)
        got = spmm(jnp.array(src), jnp.array(dst), jnp.array(w), jnp.array(h),
                   n, impl="auto")
        from dgcnn_tpu.ops.spmm import spmm_xla

        want = spmm_xla(jnp.array(src), jnp.array(dst), jnp.array(w),
                        jnp.array(h), n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_sddmm_matches_dense_and_onehot():
    """sddmm (torch-sparse capability, reference README.md:18): gather and
    one-hot formulations agree with a dense oracle, and the auto
    dispatcher's misaligned fallback stays exact."""
    import numpy as np

    from dgcnn_tpu.ops.spmm import sddmm, sddmm_onehot, sddmm_xla

    rng = np.random.default_rng(11)
    n, f, e = 24, 7, 1024
    src = jnp.array(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.array(rng.integers(0, n, e).astype(np.int32))
    a = jnp.array(rng.normal(size=(n, f)).astype(np.float32))
    b = jnp.array(rng.normal(size=(n, f)).astype(np.float32))

    want = (np.asarray(a)[np.asarray(src)] * np.asarray(b)[np.asarray(dst)]).sum(-1)
    np.testing.assert_allclose(np.asarray(sddmm_xla(src, dst, a, b)), want,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sddmm_onehot(src, dst, a, b)), want,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sddmm(src, dst, a, b, impl="auto")),
                               want, rtol=1e-5, atol=1e-5)
    # misaligned edge stream → gather fallback, same values
    np.testing.assert_allclose(
        np.asarray(sddmm(src[:1000], dst[:1000], a, b, impl="onehot")),
        want[:1000], rtol=1e-5, atol=1e-5,
    )


def test_sddmm_grads_match_between_impls():
    import numpy as np

    from dgcnn_tpu.ops.spmm import sddmm_onehot, sddmm_xla

    rng = np.random.default_rng(13)
    n, f, e = 12, 5, 1024
    src = jnp.array(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.array(rng.integers(0, n, e).astype(np.int32))
    a = jnp.array(rng.normal(size=(n, f)).astype(np.float32))
    b = jnp.array(rng.normal(size=(n, f)).astype(np.float32))
    w = jnp.array(rng.normal(size=(e,)).astype(np.float32))

    def loss(fn, a, b):
        return (fn(src, dst, a, b) * w).sum()

    ga_x, gb_x = jax.grad(lambda aa, bb: loss(sddmm_xla, aa, bb), (0, 1))(a, b)
    ga_o, gb_o = jax.grad(lambda aa, bb: loss(sddmm_onehot, aa, bb), (0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga_o), np.asarray(ga_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_o), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-5)


def test_onehot_auto_gate_boundary():
    """The one-hot SpMM auto gate was recalibrated from the measured
    N-sweep (tools/probe_onehot_breakeven.py: crossover between
    N·F = 131K and 262K; ops/spmm._ONEHOT_MAX_NF = 150K). Pin the
    routing behavior: NCI1-scale batches stay one-hot-eligible under
    auto, DD-scale batches (N·F ≈ 458K — the measured 2.5× wreck in
    tools/probe_dd_coo.py) must NOT be."""
    from dgcnn_tpu.ops.spmm import _ONEHOT_MAX_NF

    f = 32
    assert 2048 * f <= _ONEHOT_MAX_NF       # NCI1 microbench shape: eligible
    assert 4096 * f <= _ONEHOT_MAX_NF       # measured 1.7x faster: eligible
    assert 8192 * f > _ONEHOT_MAX_NF        # measured 1.3x slower: excluded
    assert 14336 * f > _ONEHOT_MAX_NF       # DD COO bucket: excluded

    # behavioral routing check via the traced program: the one-hot
    # formulation is the only spmm path that lowers the aggregation to
    # dot_general (block one-hot matmuls); the segment-sum path lowers
    # to gather + scatter/segment ops. An eligible shape must contain
    # dot_general under auto, an excluded shape must not.
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.ops.spmm import ONEHOT_EDGE_BLOCK, spmm

    rng = np.random.default_rng(0)

    def auto_jaxpr(n):
        e = ONEHOT_EDGE_BLOCK  # aligned, so only the N*F gate decides
        src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        dst = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
        w = jnp.asarray(rng.random(e).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32) * 0.1)
        return str(jax.make_jaxpr(
            lambda: spmm(src, dst, w, h, n, impl="auto")
        )()), (src, dst, w, h)

    jx_small, _ = auto_jaxpr(2048)      # eligible → one-hot matmuls
    assert "dot_general" in jx_small
    jx_big, _ = auto_jaxpr(8192)        # excluded → segment-sum path
    assert "dot_general" not in jx_big

    # and the two paths agree numerically at the boundary shape
    n = 2048
    e = ONEHOT_EDGE_BLOCK
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    want = np.asarray(spmm(src, dst, w, h, n, impl="xla"))
    got = np.asarray(spmm(src, dst, w, h, n, impl="auto"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sort_pool_folds_matches_vmapped_sort_pool():
    """The fold-lockstep SortPooling (flat fold-offset ids + pure-gather
    output enumeration) equals vmap(sort_pool) bitwise, forward and
    grad — including ties, padding slots, empty groups and sub-k
    graphs."""
    import jax

    from dgcnn_tpu.ops.sort_pool import sort_pool, sort_pool_folds

    rng = np.random.default_rng(3)
    F, S, C, slots, k = 5, 160, 6, 7, 4
    x = jnp.asarray(rng.normal(size=(F, S, C)).astype(np.float32))
    # quantized keys force ties; graph ids include the padding id == slots
    x = x.at[..., -1].set(jnp.round(x[..., -1] * 2) / 2)
    ng = jnp.asarray(rng.integers(0, slots + 1, (F, S)).astype(np.int32))

    ref = jax.vmap(sort_pool, in_axes=(0, 0, None, None))(x, ng, slots, k)
    out = sort_pool_folds(x, ng, slots, k)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    g_ref = jax.grad(
        lambda x: (jax.vmap(sort_pool, in_axes=(0, 0, None, None))(
            x, ng, slots, k) ** 2).sum()
    )(x)
    g_out = jax.grad(
        lambda x: (sort_pool_folds(x, ng, slots, k) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_out),
                               rtol=1e-6, atol=1e-7)


def _block_aligned_ids(rng, rb, slots, sizes):
    """[Σceil(n/rb)·rb] graph ids packed block-row-aligned like
    batching/block_sparse.py: graph g occupies whole row-blocks, tail
    rows of its last block carry the padding id == slots."""
    ng = []
    for g, n in enumerate(sizes):
        nb = -(-n // rb)
        ids = np.full(nb * rb, slots, np.int32)
        ids[:n] = g
        ng.append(ids)
    return np.concatenate(ng)


def test_sort_pool_row_block_prefilter_exact():
    """sort_pool(row_block=rb) must equal the full-sort path bitwise
    (fwd and grad) on block-row-aligned ids — including ties (quantized
    keys), sub-k graphs, >k nodes in one row-block, multi-block graphs
    and padded tail rows. The prefilter is the round-5 DD sortpool lever
    (reference SortAggregation semantics, model.py:17,35)."""
    import jax

    from dgcnn_tpu.ops.sort_pool import sort_pool

    rng = np.random.default_rng(11)
    rb, k, C = 8, 3, 5
    sizes = [2, 17, 8, 1, 30, 9]  # sub-k, multi-block, exact-block, ...
    slots = len(sizes) + 2  # two empty trailing slots
    ng = _block_aligned_ids(rng, rb, slots, sizes)
    S = len(ng)
    x = jnp.asarray(rng.normal(size=(S, C)).astype(np.float32))
    x = x.at[:, -1].set(jnp.round(x[:, -1] * 2) / 2)  # force ties
    ngj = jnp.asarray(ng)

    ref = sort_pool(x, ngj, slots, k)
    out = sort_pool(x, ngj, slots, k, row_block=rb)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    g_ref = jax.grad(lambda x: (sort_pool(x, ngj, slots, k) ** 2).sum())(x)
    g_out = jax.grad(
        lambda x: (sort_pool(x, ngj, slots, k, row_block=rb) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_out),
                               rtol=1e-6, atol=1e-7)


def test_sort_pool_folds_row_block_prefilter_exact():
    """Same prefilter equality for the fold-lockstep form (the DD
    production path, apply_block_folds)."""
    import jax

    from dgcnn_tpu.ops.sort_pool import sort_pool_folds

    rng = np.random.default_rng(13)
    rb, k, C, F = 8, 3, 4, 3
    slots = 6
    mats = []
    for _ in range(F):
        sizes = list(rng.integers(1, 20, size=4))
        ids = _block_aligned_ids(rng, rb, slots, sizes)
        mats.append(ids)
    S = max(len(m) for m in mats)
    S = -(-S // rb) * rb
    ng = np.full((F, S), slots, np.int32)
    for f, m in enumerate(mats):
        ng[f, : len(m)] = m
    x = jnp.asarray(rng.normal(size=(F, S, C)).astype(np.float32))
    x = x.at[..., -1].set(jnp.round(x[..., -1] * 2) / 2)
    ngj = jnp.asarray(ng)

    ref = sort_pool_folds(x, ngj, slots, k)
    out = sort_pool_folds(x, ngj, slots, k, row_block=rb)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    g_ref = jax.grad(
        lambda x: (sort_pool_folds(x, ngj, slots, k) ** 2).sum()
    )(x)
    g_out = jax.grad(
        lambda x: (sort_pool_folds(x, ngj, slots, k, row_block=rb) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_out),
                               rtol=1e-6, atol=1e-7)


def test_sort_pool_dense_onehot_rows_exact():
    """The one-hot-matmul row selection must reproduce gathered rows
    EXACTLY (each output row is 1.0 x one input row, fp32-accumulated),
    including the zero-padding of sub-k graphs."""
    from dgcnn_tpu.ops.sort_pool import sort_pool_dense

    rng = np.random.default_rng(5)
    B, n, C, k = 6, 23, 5, 9
    x = jnp.asarray(rng.normal(size=(B, n, C)).astype(np.float32))
    counts = rng.integers(1, n + 1, B)
    mask = jnp.asarray(
        (np.arange(n)[None, :] < counts[:, None]).astype(np.float32)
    )
    pooled = np.asarray(sort_pool_dense(x, mask, k))
    xh = np.asarray(x)
    for b in range(B):
        nb = int(counts[b])
        order = np.argsort(-xh[b, :nb, -1], kind="stable")[:k]
        want = xh[b][order]
        np.testing.assert_array_equal(pooled[b, : len(order)], want)
        np.testing.assert_array_equal(pooled[b, len(order):], 0.0)
