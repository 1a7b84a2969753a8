"""Golden-parity tests: full DGCNN forward vs the independent dense NumPy
oracle (SURVEY §4 item 2 — allclose on conv outputs, SortPooling outputs and
logits), across all eight dataset feature shapes, plus padding-invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.data.synthetic import PROFILES, synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params, num_params
from oracle import dgcnn_forward


def _graph_dicts(gs, idx):
    out = []
    for g in idx:
        ns, ne = gs.node_ptr[g], gs.node_ptr[g + 1]
        es, ee = gs.edge_ptr[g], gs.edge_ptr[g + 1]
        edges = np.stack([gs.edge_src[es:ee], gs.edge_dst[es:ee]], axis=1)
        edges = edges[edges[:, 0] != edges[:, 1]]
        out.append({"x": gs.x[ns:ne].copy(), "edges": edges.astype(np.int64)})
    return out


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


@pytest.mark.parametrize("name", list(PROFILES.keys()))
def test_forward_matches_oracle_all_feature_shapes(name):
    gs = synthesize_tu_dataset(name, num_graphs=12, seed=7)
    idx = np.arange(8)
    bucket = compute_bucket(gs, 8)
    batch = pack_batch(gs, idx, bucket)

    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)

    lp, acts = apply(params, model, jax.device_put(batch), return_activations=True)
    want = dgcnn_forward(_np_params(params), _graph_dicts(gs, idx), k=model.sort_pool_k)

    n_real = int(batch.node_mask.sum())
    for li in range(4):
        np.testing.assert_allclose(
            np.asarray(acts[f"gcn{li + 1}"])[:n_real],
            want[f"gcn{li + 1}"],
            rtol=2e-4,
            atol=2e-5,
            err_msg=f"{name} gcn{li + 1}",
        )
    np.testing.assert_allclose(
        np.asarray(acts["sort_pool"])[: len(idx)],
        want["sort_pool"],
        rtol=2e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(lp)[: len(idx)], want["log_probs"], rtol=3e-4, atol=3e-5
    )


def test_param_count_mutag():
    """Parameter-count cross-check vs reference README.md:96-105 (MUTAG:
    8 features, 2 classes → 52,035 params; SURVEY §2b)."""
    model = DGCNN(num_features=8, num_classes=2)
    params = init_params(jax.random.PRNGKey(0), model)
    assert num_params(params) == 52035


@pytest.mark.parametrize(
    "feats,classes,expected",
    [(19, 2, 52387), (38, 2, 52995), (5, 2, 51939), (90, 2, 54659),
     (1, 3, 51940), (1, 2, 51811)],
)
def test_param_counts_all_datasets(feats, classes, expected):
    model = DGCNN(num_features=feats, num_classes=classes)
    assert num_params(init_params(jax.random.PRNGKey(0), model)) == expected


def test_padding_invariance():
    """Logits must not depend on bucket padding: same graphs packed into a
    small vs huge bucket give identical real-slot outputs."""
    gs = synthesize_tu_dataset("PROTEINS", num_graphs=10, seed=9)
    idx = np.arange(6)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(1), model)

    small = compute_bucket(gs, 6, node_multiple=64, edge_multiple=128, graph_multiple=2)
    from dgcnn_tpu.batching import BucketSpec

    big = BucketSpec(small.num_nodes * 4, small.num_edges * 4, small.num_graphs * 4)
    lp_small = apply(params, model, jax.device_put(pack_batch(gs, idx, small)))
    lp_big = apply(params, model, jax.device_put(pack_batch(gs, idx, big)))
    np.testing.assert_allclose(
        np.asarray(lp_small)[: len(idx)],
        np.asarray(lp_big)[: len(idx)],
        rtol=1e-5,
        atol=1e-6,
    )


def test_batch_composition_invariance():
    """A graph's logits are identical whether packed alone or with others
    (no cross-graph leakage through masks/segments)."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=8, seed=11)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(2), model)
    bucket = compute_bucket(gs, 8)

    together = apply(params, model, jax.device_put(pack_batch(gs, np.arange(8), bucket)))
    alone = apply(params, model, jax.device_put(pack_batch(gs, [3], bucket)))
    np.testing.assert_allclose(
        np.asarray(together)[3], np.asarray(alone)[0], rtol=1e-5, atol=1e-6
    )


def test_dropout_train_vs_eval():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=4, seed=13)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(3), model)
    batch = jax.device_put(pack_batch(gs, np.arange(4), compute_bucket(gs, 4)))

    det = apply(params, model, batch, deterministic=True)
    k = jax.random.PRNGKey(0)
    stoch1 = apply(params, model, batch, deterministic=False, dropout_rng=k)
    stoch2 = apply(params, model, batch, deterministic=False, dropout_rng=k)
    stoch3 = apply(
        params, model, batch, deterministic=False, dropout_rng=jax.random.PRNGKey(9)
    )
    # same key → identical; different key → different; eval ≠ train (a.s.)
    np.testing.assert_array_equal(np.asarray(stoch1), np.asarray(stoch2))
    assert not np.allclose(np.asarray(stoch1), np.asarray(stoch3))
    assert not np.allclose(np.asarray(det), np.asarray(stoch1))
