"""Parity harness tests: torch weight conversion (validated against real
torch CPU ops for the readout/head, where the flatten permutation lives),
round-trips, and dump/compare plumbing (COO dump vs dense dump)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.dense import dense_tile, pack_dense_batch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, _pooled_to_log_probs, init_params
from dgcnn_tpu.parity.convert import params_to_torch_state, torch_state_to_params
from dgcnn_tpu.parity.harness import compare_dumps, dump_activations


def _model_params(seed=0, f=8, c=2):
    model = DGCNN(num_features=f, num_classes=c)
    return model, init_params(jax.random.PRNGKey(seed), model)


def test_convert_round_trip():
    model, params = _model_params()
    state = params_to_torch_state(params, model)
    back = torch_state_to_params(state, model)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_readout_head_matches_torch():
    """Our pooled→log_probs tail vs real torch Conv1d/MaxPool1d/Linear with
    converted weights — proves the conv5/conv6 layout mapping and the
    channel-major↔time-major flatten permutation (reference model.py:36-43)."""
    model, params = _model_params(seed=3)
    state = {k: torch.tensor(v) for k, v in params_to_torch_state(params, model).items()}

    rng = np.random.default_rng(0)
    pooled = rng.normal(size=(6, model.sort_pool_k, model.concat_dim)).astype(np.float32)

    ours = _pooled_to_log_probs(
        params, model, jnp.asarray(pooled), True, None, {}
    )

    x = torch.tensor(pooled).reshape(6, 1, -1)  # [B, 1, k*C] like model.py:36
    x = torch.relu(torch.nn.functional.conv1d(
        x, state["conv5.weight"], state["conv5.bias"], stride=model.concat_dim))
    x = torch.nn.functional.max_pool1d(x, 2, 2)
    x = torch.relu(torch.nn.functional.conv1d(
        x, state["conv6.weight"], state["conv6.bias"]))
    x = x.reshape(6, -1)  # channel-major flatten (model.py:40)
    x = torch.relu(torch.nn.functional.linear(
        x, state["classifier_1.weight"], state["classifier_1.bias"]))
    x = torch.nn.functional.linear(
        x, state["classifier_2.weight"], state["classifier_2.bias"])
    want = torch.log_softmax(x, dim=-1).numpy()

    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5, atol=1e-6)


def test_dump_compare_coo_vs_dense():
    """The harness compares dumps from DIFFERENT layouts — real rows only —
    so a PyG dump (dense per-graph) lines up with our packed layouts."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=10, seed=5)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(1), model)

    coo = dump_activations(params, model, pack_batch(gs, np.arange(10), compute_bucket(gs, 10)))
    dense = dump_activations(
        params, model, pack_dense_batch(gs, np.arange(10), dense_tile(gs), 16)
    )
    report = compare_dumps(coo, dense, rtol=1e-4, atol=1e-5)
    assert set(report) == {"gcn1", "gcn2", "gcn3", "gcn4", "sort_pool", "log_probs"}


def test_compare_detects_mismatch():
    a = {"gcn1": np.zeros((3, 4), np.float32)}
    b = {"gcn1": np.full((3, 4), 0.1, np.float32)}
    import pytest

    with pytest.raises(AssertionError):
        compare_dumps(a, b)
