"""Parity harness tests: torch weight conversion, FULL-NETWORK activation
equality against the plain-torch oracle (parity/torch_oracle.py — PyG's
documented GCNConv/SortAggregation algorithms transliterated into torch
ops, reference model.py:26-45) on all 8 benchmark feature shapes,
sort-tie semantics, round-trips, and dump/compare plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.dense import dense_tile, pack_dense_batch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, _pooled_to_log_probs, init_params
from dgcnn_tpu.parity.convert import params_to_torch_state, torch_state_to_params
from dgcnn_tpu.parity.harness import compare_dumps, dump_activations
from dgcnn_tpu.parity.torch_oracle import (
    _sort_pool as torch_sort_pool,
    forward_activations,
    graphs_from_graphset,
)


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


@pytest.mark.parametrize(
    "name",
    ["MUTAG", "PTC_MR", "NCI1", "PROTEINS", "DD", "COLLAB",
     "IMDB-BINARY", "IMDB-MULTI"],
)
def test_full_network_matches_torch_all_feature_shapes(name):
    """Per-stage activation equality (gcn1..4, sort_pool, log_probs) of the
    whole network vs the plain-torch transliteration of PyG's documented
    GCNConv + SortAggregation algorithms, with converted weights — the
    golden-parity contract of SURVEY §4 item 2 (reference model.py:26-45),
    run on all 8 benchmark feature shapes (SURVEY §2d)."""
    n_graphs = 6
    gs = synthesize_tu_dataset(name, num_graphs=n_graphs, seed=11)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(7), model)

    ours = dump_activations(
        params, model,
        pack_batch(gs, np.arange(n_graphs), compute_bucket(gs, n_graphs)),
    )
    theirs = forward_activations(
        params_to_torch_state(params, model), graphs_from_graphset(gs),
        k=model.sort_pool_k, num_gcn_layers=len(model.hidden_dims),
    )
    compare_dumps(ours, theirs, rtol=1e-5, atol=1e-6)


def test_full_network_matches_torch_dense_layout():
    """Same oracle contract through the DENSE layout (host-precomputed
    normalized adjacency + top_k SortPooling) — both packed formulations
    must land on the same torch-checked numbers."""
    n_graphs = 6
    gs = synthesize_tu_dataset("MUTAG", num_graphs=n_graphs, seed=11)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(7), model)

    ours = dump_activations(
        params, model,
        pack_dense_batch(gs, np.arange(n_graphs), dense_tile(gs), 8),
    )
    theirs = forward_activations(
        params_to_torch_state(params, model), graphs_from_graphset(gs),
        k=model.sort_pool_k, num_gcn_layers=len(model.hidden_dims),
    )
    compare_dumps(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "name", ["PROTEINS", "IMDB-BINARY"]  # attr-bearing and degree-only shapes
)
def test_train_step_matches_torch(name):
    """Backward + optimizer parity: 5 full-batch TRAINING steps of the
    reference update rule (NLL backward → all-default Adam → zero_grad,
    reference train.py:39-42, dropout off) through torch autograd +
    `torch.optim.Adam` versus our `value_and_grad` + `optax.adam` step
    (train/loop.py _make_step). Loss trajectory AND final parameters must
    agree — this pins the gradient of every op (SpMM transpose, sort_pool
    gather, conv/pool/linear) and the optimizer math, the two halves of
    the training step that forward-activation parity cannot see."""
    import optax

    from dgcnn_tpu.parity.torch_oracle import train_trajectory
    from dgcnn_tpu.train.loop import nll_loss_and_correct

    n_graphs = 8
    num_steps = 5
    gs = synthesize_tu_dataset(name, num_graphs=n_graphs, seed=13)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(5), model)

    # torch side: same initial weights, per-graph COO lists
    torch_losses, torch_final = train_trajectory(
        params_to_torch_state(params, model),
        graphs_from_graphset(gs),
        gs.y[:n_graphs],
        num_steps=num_steps,
        k=model.sort_pool_k,
        num_gcn_layers=len(model.hidden_dims),
    )

    # our side: the real step body (value_and_grad + optax.adam defaults),
    # deterministic=True ≡ the oracle's dropout-off contract
    from dgcnn_tpu.models.dgcnn import apply

    batch = pack_batch(gs, np.arange(n_graphs), compute_bucket(gs, n_graphs))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(p):
        lp = apply(p, model, batch, deterministic=True)
        loss, _ = nll_loss_and_correct(lp, batch.y, batch.graph_mask)
        return loss

    step = jax.jit(
        lambda p, s: (jax.value_and_grad(loss_fn)(p), s)
    )
    ours_losses = []
    for _ in range(num_steps):
        (loss, grads), _ = step(params, None)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ours_losses.append(float(loss))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=1e-5, atol=1e-7)
    ours_final = params_to_torch_state(params, model)
    assert set(ours_final) == set(torch_final)
    for key in torch_final:
        np.testing.assert_allclose(
            ours_final[key], torch_final[key], rtol=1e-4, atol=1e-6,
            err_msg=f"param trajectory diverged at {key}",
        )


def test_sort_pool_tie_semantics_match_torch():
    """Exact ties on the sort key (channel −1) through all three sorts —
    the COO global lexicographic sort, the dense masked top_k, and torch's
    stable descending argsort — must pick the SAME rows in the SAME order
    (lower node index first on equal keys, PyG's stable contract).

    Rows are made distinguishable in the leading channels while the key
    channel carries duplicated values, so any tie-order divergence shows
    up as a row mismatch rather than vanishing into identical rows."""
    from dgcnn_tpu.ops.sort_pool import sort_pool, sort_pool_dense

    rng = np.random.default_rng(3)
    k = 4
    # two graphs: one with 7 nodes (> k) and heavy ties, one with 3 (< k)
    keys = [np.array([1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0], np.float32),
            np.array([5.0, 5.0, 5.0], np.float32)]
    xs = []
    for kv in keys:
        n = kv.shape[0]
        x = rng.normal(size=(n, 5)).astype(np.float32)
        x[:, -1] = kv
        xs.append(x)

    want = torch_sort_pool([torch.as_tensor(x) for x in xs], k).numpy()

    # COO packing: concat nodes, graph ids, no padding needed for the op
    cat = np.concatenate(xs)
    node_graph = np.concatenate(
        [np.full(x.shape[0], i, np.int32) for i, x in enumerate(xs)]
    )
    got_coo = np.asarray(
        sort_pool(jnp.asarray(cat), jnp.asarray(node_graph), 2, k)
    )
    np.testing.assert_allclose(got_coo, want, rtol=0, atol=0)

    # dense packing: [B, n_max, C] + node mask
    n_max = max(x.shape[0] for x in xs)
    dense = np.zeros((2, n_max, 5), np.float32)
    mask = np.zeros((2, n_max), np.float32)
    for i, x in enumerate(xs):
        dense[i, : x.shape[0]] = x
        mask[i, : x.shape[0]] = 1.0
    got_dense = np.asarray(
        sort_pool_dense(jnp.asarray(dense), jnp.asarray(mask), k)
    )
    np.testing.assert_allclose(got_dense, want, rtol=0, atol=0)


def test_sort_pool_all_equal_conv_outputs_tie_order():
    """The degenerate all-equal-keys graph (every conv4 output identical):
    the kept rows must be exactly nodes 0..k-1 in original order, in every
    formulation — the one place the COO global-sort and the dense top_k
    could silently diverge from torch's stable sort."""
    from dgcnn_tpu.ops.sort_pool import sort_pool, sort_pool_dense

    n, k = 9, 4
    x = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    x[:, -1] = 7.0  # all keys exactly equal

    want = torch_sort_pool([torch.as_tensor(x)], k).numpy()
    np.testing.assert_array_equal(want[0], x[:k])  # torch keeps node order

    got_coo = np.asarray(
        sort_pool(jnp.asarray(x), jnp.zeros(n, jnp.int32), 1, k)
    )
    np.testing.assert_array_equal(got_coo, want)

    got_dense = np.asarray(
        sort_pool_dense(
            jnp.asarray(x)[None], jnp.ones((1, n), jnp.float32), k
        )
    )
    np.testing.assert_array_equal(got_dense, want)


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


def test_dropout_convention_matches_torch():
    """The ONE op excluded from training-step parity (dropout is
    framework-RNG-dependent) gets its CONVENTION pinned instead: with
    the identical Bernoulli mask injected, our inverted dropout
    (mask ? h/keep : 0 after relu(lin1), reference model.py:42) must
    produce the same log-probs as torch's train-time
    `F.dropout`-equivalent masking of the oracle head."""
    gs = synthesize_tu_dataset("MUTAG", num_graphs=6, seed=2)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(9), model)
    batch = pack_batch(gs, np.arange(6), compute_bucket(gs, 6))

    from dgcnn_tpu.models.dgcnn import apply

    key = jax.random.PRNGKey(123)
    keep = 1.0 - model.dropout_rate
    lp_full = np.asarray(
        apply(params, model, batch, deterministic=False, dropout_rng=key)
    )
    ours = lp_full[:6]

    # the exact mask our head drew (single dropout site consumes the key
    # directly; it spans all graph slots, real rows first)
    mask = np.asarray(
        jax.random.bernoulli(key, keep, (lp_full.shape[0], model.dense_dim))
    )

    # torch side: oracle forward to sort_pool, then the head with the
    # same mask applied after relu(lin1), torch convention h*mask/keep
    state = {
        k: torch.tensor(v)
        for k, v in params_to_torch_state(params, model).items()
    }
    acts = forward_activations(
        params_to_torch_state(params, model), graphs_from_graphset(gs),
        k=model.sort_pool_k, num_gcn_layers=len(model.hidden_dims),
    )
    pooled = torch.tensor(acts["sort_pool"])  # [B, k, C] real graphs only
    b = pooled.shape[0]
    x = pooled.reshape(b, 1, -1)
    x = torch.relu(torch.nn.functional.conv1d(
        x, state["conv5.weight"], state["conv5.bias"],
        stride=model.concat_dim))
    x = torch.nn.functional.max_pool1d(x, 2, 2)
    x = torch.relu(torch.nn.functional.conv1d(
        x, state["conv6.weight"], state["conv6.bias"]))
    x = x.reshape(b, -1)
    x = torch.relu(torch.nn.functional.linear(
        x, state["classifier_1.weight"], state["classifier_1.bias"]))
    x = x * torch.tensor(mask[:b], dtype=x.dtype) / keep  # torch F.dropout
    x = torch.nn.functional.linear(
        x, state["classifier_2.weight"], state["classifier_2.bias"])
    want = torch.log_softmax(x, dim=-1).numpy()

    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)


def test_vendored_golden_pairs():
    """Offline golden compare (VERDICT r3 #5): every `*_ours.npz` under
    dgcnn_tpu/assets/golden/ must match its sibling dump
    (`*_oracle.npz` = the transliterated torch oracle, vendored to pin
    today's numbers against silent drift in init/packing/model code;
    `*_pyg.npz` = a REAL PyTorch-Geometric dump generated on an egress
    machine — the recipe is in README.md §"Golden parity artifacts").
    Real-PyG pairs drop into the same folder and are picked up by this
    same test, closing the PARITY.md transliteration caveat the moment
    one is committed."""
    import glob

    from dgcnn_tpu.parity.harness import _load_acts

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dgcnn_tpu", "assets", "golden",
    )
    pairs = []
    for ours_path in sorted(glob.glob(os.path.join(root, "*_ours.npz"))):
        stem = ours_path[: -len("_ours.npz")]
        for kind in ("_pyg.npz", "_oracle.npz"):
            if os.path.exists(stem + kind):
                pairs.append((ours_path, stem + kind))
    assert pairs, f"no vendored golden pairs under {root}"
    for ours_path, ref_path in pairs:
        compare_dumps(
            _load_acts(ours_path), _load_acts(ref_path),
            rtol=1e-5, atol=1e-6,
        )


def test_vendored_golden_reproducible():
    """The vendored JAX-side dump must be REGENERABLE by today's code —
    if init/packing/forward change, this fails loudly (then the golden
    pair is regenerated deliberately, never silently)."""
    golden = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dgcnn_tpu", "assets", "golden", "MUTAG_synthetic_s11_ours.npz",
    )
    from dgcnn_tpu.parity.harness import _load_acts

    n = 6
    gs = synthesize_tu_dataset("MUTAG", num_graphs=n, seed=11)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(7), model)
    ours = dump_activations(
        params, model,
        pack_batch(gs, np.arange(n), compute_bucket(gs, n)),
    )
    compare_dumps(ours, _load_acts(golden), rtol=1e-6, atol=1e-7)


def _install_fake_pyg(monkeypatch, data_root):
    """Minimal torch_geometric stand-ins backed by plain torch (the
    torch_oracle semantics), installed into sys.modules so
    parity/pyg_dump.py runs END-TO-END offline (VERDICT r4 #8: the
    egress recipe's argument/IO path must be exercised in the fast gate
    so it cannot rot). The fake TUDataset serves the SAME synthetic
    graphs `harness dump --synthetic` loads (load_dataset), with the
    degree column stripped so pyg_dump's Indegree pre-transform
    recomputes it."""
    import sys
    import types

    from dgcnn_tpu.data.datasets import load_dataset
    from dgcnn_tpu.parity.torch_oracle import _gcn_conv, _sort_pool

    class _Data:
        def __init__(self, x, edge_index, num_nodes):
            self.x = x
            self.edge_index = edge_index
            self.num_nodes = num_nodes

    class _TUDataset:
        def __init__(self, root, name, pre_transform=None,
                     use_node_attr=True):
            gs, _ = load_dataset(
                name, root=data_root, allow_download=False,
                allow_synthetic=True, use_node_attr=use_node_attr,
            )
            self._graphs = []
            for i in range(gs.num_graphs):
                ns, ne = gs.node_ptr[i], gs.node_ptr[i + 1]
                es, ee = gs.edge_ptr[i], gs.edge_ptr[i + 1]
                x = torch.as_tensor(
                    np.asarray(gs.x[ns:ne, :-1], np.float32)
                )
                x = x if x.shape[1] else None  # degree-only datasets
                # GraphSet edge ids are graph-local already
                ei = torch.as_tensor(np.stack([
                    np.asarray(gs.edge_src[es:ee], np.int64),
                    np.asarray(gs.edge_dst[es:ee], np.int64),
                ]))
                d = _Data(x, ei, int(ne - ns))
                if pre_transform is not None:
                    d = pre_transform(d)
                self._graphs.append(d)
            self.num_classes = gs.num_classes
            self.num_features = int(self._graphs[0].x.shape[1])

        def __len__(self):
            return len(self._graphs)

        def __getitem__(self, idx):
            if isinstance(idx, list):
                sub = object.__new__(_TUDataset)
                sub._graphs = [self._graphs[i] for i in idx]
                sub.num_classes = self.num_classes
                sub.num_features = self.num_features
                return sub
            return self._graphs[idx]

    class _DataLoader:
        def __init__(self, ds, batch_size, shuffle=False):
            assert not shuffle
            self._ds = ds

        def __iter__(self):
            gs = [self._ds[i] for i in range(len(self._ds))]
            xs, eis, bvec = [], [], []
            off = 0
            for b, d in enumerate(gs):
                xs.append(d.x)
                eis.append(d.edge_index + off)
                bvec.append(torch.full((d.num_nodes,), b,
                                       dtype=torch.long))
                off += d.num_nodes
            batch = _Data(torch.cat(xs), torch.cat(eis, dim=1), off)
            batch.batch = torch.cat(bvec)
            yield batch

    class _GCNConv(torch.nn.Module):
        def __init__(self, f_in, f_out):
            super().__init__()
            self.lin = torch.nn.Linear(f_in, f_out, bias=False)
            self.bias = torch.nn.Parameter(torch.zeros(f_out))

        def forward(self, x, edge_index):
            return _gcn_conv(
                x, self.lin.weight, self.bias,
                edge_index[0], edge_index[1],
            )

    class _SortAggregation(torch.nn.Module):
        def __init__(self, k):
            super().__init__()
            self.k = k

        def forward(self, x, batch):
            nb = int(batch.max()) + 1
            xs = [x[batch == b] for b in range(nb)]
            return _sort_pool(xs, self.k).reshape(nb, -1)

    def _remove_self_loops(edge_index):
        keep = edge_index[0] != edge_index[1]
        return edge_index[:, keep], None

    def _degree(col, num_nodes):
        return torch.zeros(num_nodes).index_add_(
            0, col.long(), torch.ones(col.shape[0])
        )

    tg = types.ModuleType("torch_geometric")
    tg.datasets = types.ModuleType("torch_geometric.datasets")
    tg.datasets.TUDataset = _TUDataset
    tg.loader = types.ModuleType("torch_geometric.loader")
    tg.loader.DataLoader = _DataLoader
    tg.nn = types.ModuleType("torch_geometric.nn")
    tg.nn.GCNConv = _GCNConv
    tg.nn.SortAggregation = _SortAggregation
    tg.utils = types.ModuleType("torch_geometric.utils")
    tg.utils.remove_self_loops = _remove_self_loops
    tg.utils.degree = _degree
    for name, mod in (
        ("torch_geometric", tg),
        ("torch_geometric.datasets", tg.datasets),
        ("torch_geometric.loader", tg.loader),
        ("torch_geometric.nn", tg.nn),
        ("torch_geometric.utils", tg.utils),
    ):
        monkeypatch.setitem(sys.modules, name, mod)


def test_pyg_dump_recipe_dry_run(tmp_path, monkeypatch):
    """The README golden-parity recipe end-to-end with torch standing in
    for PyG: `harness dump` → `pyg_dump.py` → `harness compare` must
    produce PARITY OK on the same synthetic graphs. Exercises
    pyg_dump.py's real argument parsing, weight-npz ingestion
    (state_dict key layout from parity/convert.py), forward, and output
    format — so the zero-egress recipe cannot rot (VERDICT r4 #8)."""
    from dgcnn_tpu.parity import harness, pyg_dump

    root = str(tmp_path / "data")
    ours = str(tmp_path / "ours.npz")
    pyg = str(tmp_path / "pyg.npz")
    n = 10

    rc = harness.main([
        "dump", "--data_type", "MUTAG", "--out", ours,
        "--num_graphs", str(n), "--synthetic", "--data_root", root,
    ])
    assert rc == 0

    _install_fake_pyg(monkeypatch, root)
    pyg_dump.main([
        "--data_type", "MUTAG", "--weights", ours, "--out", pyg,
        "--num_graphs", str(n), "--data_root", root,
    ])

    rc = harness.main(["compare", ours, pyg])
    assert rc == 0
