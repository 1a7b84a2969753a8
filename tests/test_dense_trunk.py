"""Fused dense GCN trunk (kernels/dense_trunk.py) vs the einsum chain:
forward and full gradient equality in Pallas interpret mode, including
per-slot weight-set selection (the fold-lockstep contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.dense_trunk import gcn_trunk_fused

DIMS = (32, 32, 32, 1)


def _ref(adj, hw1, mask, wsel, ws, bs):
    outs = []
    hw = hw1
    for i in range(len(DIMS)):
        b = bs[i][wsel][:, None, :]
        h = jnp.tanh(
            jnp.einsum("sij,sjf->sif", adj, hw,
                       preferred_element_type=jnp.float32) + b
        ) * mask[:, :, None]
        outs.append(h)
        if i + 1 < len(DIMS):
            hw = jnp.einsum("snd,sdo->sno", h, ws[i][wsel],
                            preferred_element_type=jnp.float32)
    return jnp.concatenate(outs, axis=-1)


def _case(seed=0, s=4, t=64, k=2):
    rng = np.random.default_rng(seed)
    adj = rng.normal(size=(s, t, t)).astype(np.float32) * 0.1
    adj = (adj + adj.transpose(0, 2, 1)) / 2  # symmetric (GCN norm is)
    hw1 = jnp.asarray(rng.normal(size=(s, t, DIMS[0])).astype(np.float32))
    mask = jnp.asarray((rng.random((s, t)) > 0.25).astype(np.float32))
    wsel = jnp.asarray(rng.integers(0, k, s).astype(np.int32))
    ws = tuple(
        jnp.asarray(rng.normal(size=(k, a, b)).astype(np.float32) * 0.3)
        for a, b in zip(DIMS[:-1], DIMS[1:])
    )
    bs = tuple(
        jnp.asarray(rng.normal(size=(k, d)).astype(np.float32) * 0.1)
        for d in DIMS
    )
    return jnp.asarray(adj), hw1, mask, wsel, ws, bs


def test_fused_trunk_forward_matches_einsum_chain():
    adj, hw1, mask, wsel, ws, bs = _case()
    got = gcn_trunk_fused(DIMS, True, adj, hw1, mask, wsel, ws, bs)
    want = _ref(adj, hw1, mask, wsel, ws, bs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_fused_trunk_grads_match_einsum_chain():
    adj, hw1, mask, wsel, ws, bs = _case(seed=1)

    def loss_f(hw1, ws, bs):
        return (
            gcn_trunk_fused(DIMS, True, adj, hw1, mask, wsel, ws, bs) ** 2
        ).sum()

    def loss_r(hw1, ws, bs):
        return (_ref(adj, hw1, mask, wsel, ws, bs) ** 2).sum()

    g_f = jax.grad(loss_f, argnums=(0, 1, 2))(hw1, ws, bs)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(hw1, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_fused_trunk_bf16_adjacency():
    """bf16-stored adjacency: the kernel streams it at storage width with
    fp32 accumulation — same contract as the einsum path's prop_dt."""
    adj, hw1, mask, wsel, ws, bs = _case(seed=2)
    adj16 = adj.astype(jnp.bfloat16)
    got = gcn_trunk_fused(DIMS, True, adj16, hw1, mask, wsel, ws, bs)
    want = _ref(adj16, hw1, mask, wsel, ws, bs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3
    )


def test_model_trunk_fused_matches_xla_path():
    """apply_dense with model.dense_trunk='fused' equals the einsum path
    (interpret mode is CPU-only, so exercise the model wiring by calling
    the kernel path's building blocks directly through _dense_trunk's
    gate: on CPU the gate falls back to xla — assert exactly that)."""
    from dgcnn_tpu.batching.dense import dense_tile, pack_dense_batch
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.models.dgcnn import DGCNN, apply_dense, init_params

    gs = synthesize_tu_dataset("MUTAG", num_graphs=6, seed=11)
    b = pack_dense_batch(gs, np.arange(6), dense_tile(gs), 8)
    m_x = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    m_f = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes,
                dense_trunk="fused")
    params = init_params(jax.random.PRNGKey(7), m_x)
    lp_x = apply_dense(params, m_x, b)
    lp_f = apply_dense(params, m_f, b)  # CPU → falls back to xla
    np.testing.assert_array_equal(np.asarray(lp_x), np.asarray(lp_f))


def test_lockstep_runner_forces_xla_trunk(monkeypatch):
    """make_dense_vmap_run must not route the fused trunk: it vmaps the
    whole apply over the fold axis, which would batch the pallas grid
    (unsupported form — the 2026-08-21 on-chip A/B record in
    Config.resolved_dense_trunk). The guard is cv_vmap._force_xla_trunk;
    pin both the helper's semantics and that the runner applies it."""
    import optax

    from dgcnn_tpu.models.dgcnn import DGCNN
    from dgcnn_tpu.train import cv_vmap

    model = DGCNN(num_features=4, num_classes=2, dense_trunk="fused")
    forced = cv_vmap._force_xla_trunk(model)
    assert forced.dense_trunk == "xla"
    import dataclasses

    assert dataclasses.replace(forced, dense_trunk="fused") == model
    # non-fused models pass through untouched
    assert cv_vmap._force_xla_trunk(forced) is forced

    seen = []
    orig = cv_vmap._force_xla_trunk
    monkeypatch.setattr(
        cv_vmap, "_force_xla_trunk", lambda m: seen.append(m) or orig(m)
    )
    cv_vmap.make_dense_vmap_run(model, optax.adam(1e-3))
    assert seen == [model]
