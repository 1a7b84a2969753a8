"""Halo-exchange edge partitioning (parallel/halo.py +
batching/shard_pack.py): partition invariance vs the single-device COO
path, gradient equality, per-device memory shrinkage, and packer
invariants — on the virtual 8-device CPU mesh (SURVEY §4 item 5)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.shard_pack import (
    halo_owned_order,
    halo_width,
    pack_batch_halo,
    pack_step_halo,
)
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply_coo, init_params
from dgcnn_tpu.parallel import make_mesh
from dgcnn_tpu.parallel.halo import _halo_pspecs, apply_halo, make_halo_loss
from dgcnn_tpu.parallel.train_dp import _loss_terms

N_DATA, N_GRAPH = 2, 4
S, E_S, B_S = 128, 512, 8


def _setup(n_graphs=16, seed=3):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=n_graphs, seed=seed)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    mesh = make_mesh((N_DATA, N_GRAPH))
    halo = halo_width(gs)
    batch = pack_step_halo(
        gs, np.arange(n_graphs), N_DATA, N_GRAPH, S, E_S, B_S, halo
    )
    return gs, model, params, mesh, halo, batch


def _reference_logprobs(gs, model, params, n_graphs):
    """Single-device COO forward over the same graphs, real rows only, in
    original graph order."""
    out = []
    for part in np.array_split(np.arange(n_graphs), N_DATA):
        b = pack_batch(gs, part, compute_bucket(gs, len(part)))
        lp = apply_coo(params, model, b)
        out.append(np.asarray(lp)[: len(part)])
    return np.concatenate(out)


def test_partition_invariance_logprobs():
    """1-chip logits == DP×halo-sharded logits (SURVEY §4 item 5's
    partition-invariance contract, now with nodes actually SHARDED)."""
    gs, model, params, mesh, halo, batch = _setup()
    specs = _halo_pspecs(halo)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), specs),
        out_specs=P(("data", "graph")),
    )
    def lp_fn(params, batch):
        local = jax.tree_util.tree_map(lambda a: a[0], batch)
        return apply_halo(params, model, local)[None]

    lp = np.asarray(lp_fn(params, batch)).reshape(-1, gs.num_classes)
    got = lp[halo_owned_order(batch)]
    want = _reference_logprobs(gs, model, params, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_partition_invariance_loss_and_grads():
    gs, model, params, mesh, halo, batch = _setup()
    loss_fn = make_halo_loss(model, mesh, halo, deterministic=True)

    def halo_loss(p):
        loss, correct = loss_fn(p, batch, jax.random.PRNGKey(0))
        return loss, correct

    got_loss, got_correct = halo_loss(params)

    # single-device reference: mean NLL + correct over all real graphs
    want = _reference_logprobs(gs, model, params, 16)
    y = gs.y[:16]
    ls, c = _loss_terms(
        jnp.asarray(want), jnp.asarray(y), jnp.ones(16, jnp.float32)
    )
    np.testing.assert_allclose(float(got_loss), float(ls) / 16, rtol=1e-5)
    assert float(got_correct) == float(c)

    # gradient equality vs the unsharded loss on one packed batch per
    # sub-batch (same global-mean semantics)
    def ref_loss(p):
        total = 0.0
        for part in np.array_split(np.arange(16), N_DATA):
            b = pack_batch(gs, part, compute_bucket(gs, len(part)))
            lp = apply_coo(p, model, b)
            lsum, _ = _loss_terms(lp, b.y, b.graph_mask)
            total = total + lsum
        return total / 16.0

    g_halo = jax.grad(lambda p: halo_loss(p)[0])(params)
    g_ref = jax.grad(ref_loss)(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_halo), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_per_device_arrays_shrink_with_graph_axis():
    """The round-1 gap: replicated nodes meant per-device HBM did not drop
    with the graph axis. Here the node block is S rows per device —
    1/n_graph of the sub-batch's node budget."""
    gs, model, params, mesh, halo, batch = _setup()
    assert batch.x.shape == (N_DATA * N_GRAPH, S, gs.num_features)
    # total sharded node rows across one sub-batch == N_GRAPH · S, and a
    # single device's block is exactly 1/N_GRAPH of that
    n_total = N_GRAPH * S
    assert batch.x.shape[1] == n_total // N_GRAPH


def test_packer_invariants():
    gs, *_ = _setup()
    halo = halo_width(gs)
    b = pack_batch_halo(gs, np.arange(8), N_GRAPH, S, E_S, B_S, halo)
    # every real edge's extended src resolves inside [0, S+2H)
    real = b.edge_mask > 0
    assert b.edge_src_ext[real].min() >= 0
    assert b.edge_src_ext[real].max() < S + 2 * halo
    assert b.edge_dst_loc[real].max() < S
    # dst column non-decreasing per shard (segment-sum contract)
    for sh in range(N_GRAPH):
        d = b.edge_dst_loc[sh]
        assert np.all(np.diff(d) >= 0)
    # each graph owned exactly once, slots dense from 0
    assert int(b.num_graphs.sum()) == 8
    assert float(b.graph_mask.sum()) == 8.0
    # halo too small must be rejected loudly
    with pytest.raises(ValueError, match="halo"):
        pack_batch_halo(gs, np.arange(8), N_GRAPH, S, E_S, B_S, halo=1)


def test_oversubscribed_slots_rejected():
    gs, *_ = _setup()
    halo = halo_width(gs)
    with pytest.raises(ValueError, match="slots|budget|window"):
        pack_batch_halo(gs, np.arange(16), 1, 64, E_S, 2, halo)


@pytest.mark.slow
def test_epoch_makers_match_dp_engine_metrics():
    """make_halo_train_epoch/make_halo_eval_epoch (scanned epochs on the
    mesh) produce the same per-epoch metrics as the replicated-node DP
    path on the same batch order — the two engines implement the same
    global-batch protocol."""
    from dgcnn_tpu.batching.shard_pack import halo_bucket, pack_epoch_halo
    from dgcnn_tpu.parallel import (
        make_dp_eval_epoch,
        pack_epoch_dp,
        shard_bucket,
    )
    from dgcnn_tpu.parallel.halo import (
        device_put_halo_epoch,
        make_halo_eval_epoch,
        make_halo_train_epoch,
    )
    from dgcnn_tpu.parallel.train_dp import device_put_epoch
    import optax

    gs, model, params, mesh, _, _ = _setup(n_graphs=24)
    bs = 12
    bucket = halo_bucket(gs, bs, N_DATA, N_GRAPH)
    order = np.arange(24)
    batches = device_put_halo_epoch(
        pack_epoch_halo(gs, order, bs, N_DATA, N_GRAPH, bucket),
        mesh, bucket.halo,
    )

    eval_halo = make_halo_eval_epoch(model, mesh, bucket.halo)
    loss_h, correct_h = eval_halo(params, batches)

    dp_bucket = shard_bucket(gs, bs, N_DATA, 64, 512, 4, N_GRAPH)
    dp_batches = device_put_epoch(
        pack_epoch_dp(gs, order, bs, dp_bucket, N_DATA, N_GRAPH), mesh
    )
    eval_dp = make_dp_eval_epoch(model, mesh)
    loss_d, correct_d = eval_dp(params, dp_batches)
    np.testing.assert_allclose(float(loss_h), float(loss_d), rtol=1e-5)
    assert float(correct_h) == float(correct_d)

    # the train epoch runs and improves on a planted-signal synthetic
    opt = optax.adam(1e-3)
    train = make_halo_train_epoch(model, opt, mesh, bucket.halo)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)
    p = params
    first = None
    for _ in range(4):
        p, opt_state, rng, tr_loss, _ = train(p, opt_state, rng, batches)
        first = float(tr_loss) if first is None else first
    assert float(tr_loss) < first


@pytest.mark.slow
def test_mesh_halo_engine_cv(tmp_path):
    """`--layout halo --mesh 2,4` end-to-end through run_cross_validation
    on the virtual 8-device mesh: artifacts written, sane accuracy."""
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("MUTAG", num_graphs=24, seed=5)
    cfg = Config(
        data_type="MUTAG", batch_size=8, num_epochs=2, num_folds=2,
        layout="halo", mesh_shape=(N_DATA, N_GRAPH), seed=11,
        cv_parallel="sequential",
        statistics_dir=str(tmp_path / "stats"),
        epochs_dir=str(tmp_path / "epochs"),
    )
    result = run_cross_validation(cfg, dataset=gs)
    assert np.isfinite(result["test_accuracy_mean"])


def test_halo_layout_requires_mesh():
    from dgcnn_tpu.config import Config
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN
    from dgcnn_tpu.train.cv import make_engine
    import optax

    gs = synthesize_tu_dataset("MUTAG", num_graphs=8, seed=0)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    cfg = Config(data_type="MUTAG", layout="halo")
    with pytest.raises(ValueError, match="halo"):
        make_engine(cfg, gs, model, optax.adam(1e-3), "halo")


@pytest.mark.slow
def test_partition_invariance_large_graphs_dd_profile():
    """DD-profile graphs (hundreds of nodes) straddle shard boundaries —
    the geometry MUTAG never exercises: H is large, graphs span two
    shards, and ownership windows extend well into neighbors. Logits must
    still equal the single-device forward."""
    gs = synthesize_tu_dataset("DD", num_graphs=8, seed=9)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    mesh = make_mesh((N_DATA, N_GRAPH))
    halo = halo_width(gs)
    from dgcnn_tpu.batching.shard_pack import halo_bucket

    bucket = halo_bucket(gs, 4, N_DATA, N_GRAPH)
    assert bucket.shard_nodes >= halo  # S >= H invariant
    batch = pack_step_halo(
        gs, np.arange(8), N_DATA, N_GRAPH, bucket.shard_nodes,
        bucket.shard_edges, bucket.shard_graphs, bucket.halo,
    )
    # at least one graph must actually straddle a shard boundary, or this
    # test exercises nothing new
    node_rows_per_shard = batch.node_mask.reshape(
        N_DATA, N_GRAPH, -1).sum(axis=2)
    assert (node_rows_per_shard[:, 1:] > 0).any(), node_rows_per_shard

    specs = _halo_pspecs(bucket.halo)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), specs),
        out_specs=P(("data", "graph")),
    )
    def lp_fn(params, batch):
        local = jax.tree_util.tree_map(lambda a: a[0], batch)
        return apply_halo(params, model, local)[None]

    lp = np.asarray(lp_fn(params, batch)).reshape(-1, gs.num_classes)
    got = lp[halo_owned_order(batch)]
    out = []
    for part in np.array_split(np.arange(8), N_DATA):
        b = pack_batch(gs, part, compute_bucket(gs, len(part)))
        out.append(np.asarray(apply_coo(params, model, b))[: len(part)])
    want = np.concatenate(out)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
