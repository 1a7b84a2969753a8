"""Data layer tests: TU parser round-trip, feature assembly, folds.

Mirrors SURVEY §4 unit-test targets: parser vs known dataset stats,
Indegree vs hand-computed degrees.
"""

import numpy as np
import pytest

from dgcnn_tpu.data import (
    GraphSet,
    load_fold_indices,
    make_stratified_folds,
    parse_tu_dir,
    synthesize_tu_dataset,
    write_tu_format,
)
from dgcnn_tpu.data.datasets import DATASET_STATS, load_dataset
from dgcnn_tpu.data.synthetic import PROFILES


def tiny_graphset():
    """Two tiny graphs with hand-checkable degrees.

    g0: 3 nodes, edges 0→1, 1→0, 1→2, 2→1 (path). in-deg = [1, 2, 1]
    g1: 2 nodes, edges 0→1, 1→0.            in-deg = [1, 1]
    """
    node_ptr = np.array([0, 3, 5], dtype=np.int64)
    edge_src = np.array([0, 1, 1, 2, 0, 1], dtype=np.int32)
    edge_dst = np.array([1, 0, 2, 1, 1, 0], dtype=np.int32)
    edge_ptr = np.array([0, 4, 6], dtype=np.int64)
    x = np.arange(10, dtype=np.float32).reshape(5, 2)
    y = np.array([0, 1], dtype=np.int32)
    return GraphSet(x, node_ptr, edge_src, edge_dst, edge_ptr, y, 2)


def test_tu_roundtrip(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=25, seed=3)
    # re-derive label/attr columns to emit: drop the final degree column and
    # recover categorical labels from the one-hot block
    onehot = gs.x[:, :-1]
    node_labels = onehot.argmax(axis=1).astype(np.int64)
    raw = tmp_path / "raw"
    write_tu_format(
        str(raw),
        "SYN",
        gs.node_ptr,
        gs.edge_src,
        gs.edge_dst,
        gs.edge_ptr,
        gs.y,
        node_labels=node_labels,
    )
    parsed = parse_tu_dir(str(raw), "SYN")
    assert parsed.num_graphs == gs.num_graphs
    assert parsed.num_classes == gs.num_classes
    np.testing.assert_array_equal(parsed.node_ptr, gs.node_ptr)
    np.testing.assert_array_equal(parsed.y, gs.y)
    # same edges (parser may reorder within a graph): compare sorted pairs
    for g in range(gs.num_graphs):
        a = np.stack(
            [
                gs.edge_src[gs.edge_ptr[g] : gs.edge_ptr[g + 1]],
                gs.edge_dst[gs.edge_ptr[g] : gs.edge_ptr[g + 1]],
            ],
            axis=1,
        )
        b = np.stack(
            [
                parsed.edge_src[parsed.edge_ptr[g] : parsed.edge_ptr[g + 1]],
                parsed.edge_dst[parsed.edge_ptr[g] : parsed.edge_ptr[g + 1]],
            ],
            axis=1,
        )
        a = a[np.lexsort((a[:, 1], a[:, 0]))]
        b = b[np.lexsort((b[:, 1], b[:, 0]))]
        np.testing.assert_array_equal(a, b)
    # identical feature assembly (one-hot + per-graph normalized degree)
    np.testing.assert_allclose(parsed.x, gs.x, rtol=1e-6)


def test_indegree_normalization():
    """Degree column normalized by the PER-GRAPH max (reference
    utils.py:22-23 — pre_transform runs per graph)."""
    gs = tiny_graphset()
    from dgcnn_tpu.data.tu_parser import assemble_features

    x = assemble_features(
        total_nodes=5,
        node_ptr=gs.node_ptr,
        local_dst=gs.edge_dst,
        edge_ptr=gs.edge_ptr,
        node_labels=None,
        node_attrs=gs.x,
    )
    # g0 degrees [1,2,1], max 2 → [0.5, 1.0, 0.5]; g1 [1,1], max 1 → [1, 1]
    np.testing.assert_allclose(x[:, -1], [0.5, 1.0, 0.5, 1.0, 1.0])
    # attrs preserved in front
    np.testing.assert_allclose(x[:, :-1], gs.x)


def test_degree_only_datasets():
    """COLLAB/IMDB have no labels/attrs → degree is the only feature
    (reference utils.py:30-31; SURVEY §2d)."""
    gs = synthesize_tu_dataset("IMDB-BINARY", num_graphs=10, seed=0)
    assert gs.num_features == 1


def test_degree_only_planted_signal_survives_normalization():
    """The degree-only class signal is degree ASSORTATIVITY (class sets the
    core/periphery mixing of a two-block model), chosen because it is what
    a GCN layer can read on the top-degree nodes that survive per-graph max
    degree normalization (reference utils.py:22-23) AND top-k SortPooling —
    a plain density shift survives neither. Pin the separation: the mean
    degree/neighbor-mean-degree correlation must rise with class index."""
    gs = synthesize_tu_dataset("IMDB-BINARY", num_graphs=200, seed=0)
    assort = {c: [] for c in range(gs.num_classes)}
    for i in range(len(gs.y)):
        lo, hi = gs.node_ptr[i], gs.node_ptr[i + 1]
        f = gs.x[lo:hi, -1].astype(np.float64)
        el, eh = gs.edge_ptr[i], gs.edge_ptr[i + 1]
        s, d = gs.edge_src[el:eh], gs.edge_dst[el:eh]  # graph-local
        deg = np.bincount(d, minlength=hi - lo).astype(np.float64)
        nm = np.bincount(d, weights=f[s], minlength=hi - lo)
        nm /= np.maximum(deg, 1)
        if f.std() > 0 and nm.std() > 0:
            assort[int(gs.y[i])].append(float(np.corrcoef(f, nm)[0, 1]))
    means = [np.mean(assort[c]) for c in range(gs.num_classes)]
    assert means[1] - means[0] > 0.4, means


def test_profiles_match_published_stats():
    for name, stats in DATASET_STATS.items():
        p = PROFILES[name]
        assert p["num_graphs"] == stats["num_graphs"]
        assert p["num_classes"] == stats["num_classes"]
        # feature dim = attrs + label bins + degree column
        assert p["num_attrs"] + p["num_node_labels"] + 1 == stats["num_features"]


def test_subset_preserves_graphs():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=1)
    sub = gs.subset(np.array([5, 2, 7]))
    assert sub.num_graphs == 3
    np.testing.assert_array_equal(sub.y, gs.y[[5, 2, 7]])
    # graph 1 of the subset is original graph 2
    n0, n1 = gs.node_ptr[2], gs.node_ptr[3]
    np.testing.assert_allclose(
        sub.x[sub.node_ptr[1] : sub.node_ptr[2]], gs.x[n0:n1]
    )


def test_fold_files_roundtrip(tmp_path):
    train = np.array([0, 2, 4, 6])
    test = np.array([1, 3])
    np.savetxt(tmp_path / "train_idx-1.txt", train, fmt="%d")
    np.savetxt(tmp_path / "test_idx-1.txt", test, fmt="%d")
    tr, te = load_fold_indices(str(tmp_path), 1)
    np.testing.assert_array_equal(tr, train)
    np.testing.assert_array_equal(te, test)


def test_stratified_folds_partition():
    y = np.array([0] * 17 + [1] * 23)
    folds = make_stratified_folds(y, num_folds=10, seed=0)
    assert len(folds) == 10
    all_test = np.concatenate([te for _, te in folds])
    # exact partition
    np.testing.assert_array_equal(np.sort(all_test), np.arange(40))
    for tr, te in folds:
        assert len(np.intersect1d(tr, te)) == 0
        assert len(tr) + len(te) == 40


def test_load_dataset_synthetic_cache(tmp_path):
    gs, meta = load_dataset(
        "MUTAG", root=str(tmp_path), allow_download=False, allow_synthetic=True
    )
    assert meta.source == "synthetic"
    assert gs.num_classes == 2


def test_load_dataset_from_raw(tmp_path):
    gs = synthesize_tu_dataset("IMDB-BINARY", num_graphs=12, seed=5)
    raw = tmp_path / "IMDB-BINARY" / "raw"
    write_tu_format(
        str(raw),
        "IMDB-BINARY",
        gs.node_ptr,
        gs.edge_src,
        gs.edge_dst,
        gs.edge_ptr,
        gs.y,
    )
    loaded, meta = load_dataset("IMDB-BINARY", root=str(tmp_path), allow_download=False)
    assert meta.source == "raw"
    np.testing.assert_allclose(loaded.x, gs.x, rtol=1e-6)
    # second load hits the npz cache
    again, meta2 = load_dataset("IMDB-BINARY", root=str(tmp_path), allow_download=False)
    assert meta2.source == "cache"
    np.testing.assert_allclose(again.x, gs.x, rtol=1e-6)


def test_bundled_canonical_folds():
    """The bundled canonical fold asset (reference data/*/10fold_idx via
    tools/import_reference_folds.py) resolves for all 8 datasets at their
    real graph counts, and is refused for differently-sized datasets."""
    from dgcnn_tpu.data.folds import get_folds, load_bundled_folds

    for name, stats in DATASET_STATS.items():
        folds = load_bundled_folds(name, 10, stats["num_graphs"])
        assert folds is not None, name
        assert len(folds) == 10
        for tr, te in folds:
            assert len(np.intersect1d(tr, te)) == 0
            assert int(max(tr.max(), te.max())) < stats["num_graphs"]
    # MUTAG fold-1 counts documented in SURVEY §2a: 18 per test fold
    tr1, te1 = load_bundled_folds("MUTAG", 10, 188)[0]
    assert len(te1) == 18
    # a 40-graph synthetic MUTAG must NOT get the 188-graph folds
    assert load_bundled_folds("MUTAG", 10, 40) is None
    y = np.arange(40) % 2
    folds = get_folds(y, fold_dir="", num_folds=10, seed=0, data_type="MUTAG")
    assert max(int(te.max()) for _, te in folds) < 40


def test_parse_real_tu_quirks(tmp_path):
    """Real TU files: negative/non-contiguous graph labels, spaces after
    commas, an edge_labels file (ignored — the model consumes only
    x/edge_index, reference model.py:27), attrs with mixed spacing."""
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "Q_A.txt").write_text("1, 2\n2,1\n3, 3\n4,3\n3,4\n")
    (raw / "Q_graph_indicator.txt").write_text("1\n1\n2\n2\n")
    (raw / "Q_graph_labels.txt").write_text("-1\n6\n")
    (raw / "Q_node_labels.txt").write_text("7\n2\n7\n2\n")
    (raw / "Q_edge_labels.txt").write_text("0\n0\n1\n1\n1\n")
    (raw / "Q_node_attributes.txt").write_text(
        "0.5, 1.25\n-0.5,2.0\n3.0, 4.0\n5.0,6.0\n"
    )
    gs = parse_tu_dir(str(raw), "Q")
    assert gs.num_graphs == 2
    assert gs.num_classes == 2
    np.testing.assert_array_equal(gs.y, [0, 1])  # {-1,6} → {0,1}
    # features: 2 attrs + one-hot over [2..7] min-shifted (6 bins, PyG's
    # read_tu_data keeps all-zero columns for non-occurring labels) +
    # degree = 9
    assert gs.num_features == 9
    np.testing.assert_allclose(gs.x[0, :2], [0.5, 1.25])
    # node 0 has label 7 → min-shifted column 5 of 6
    np.testing.assert_allclose(gs.x[0, 2:8], [0, 0, 0, 0, 0, 1.0])
    # graph 1 contains a self-loop (3,3) which counts toward raw in-degree
    # (Indegree runs before remove_self_loops — reference utils.py:19-20)
    # g1 in-degrees: node0(global 3): from (3,3)? no — global node 3 is
    # g1's node 0; edges in g1: (3,3),(4,3),(3,4) → local (0,0),(1,0),(0,1)
    # in-deg local = [2,1], max 2 → [1.0, 0.5]
    np.testing.assert_allclose(gs.x[2:, 8], [1.0, 0.5])


def test_bundled_folds_rejected_for_larger_dataset():
    """A dataset LARGER than the real benchmark must not silently adopt
    bundled folds that never cover its extra graphs (index range alone is
    not enough — the folds must partition the dataset)."""
    from dgcnn_tpu.data.folds import load_bundled_folds

    assert load_bundled_folds("MUTAG", 10, 188) is not None
    assert load_bundled_folds("MUTAG", 10, 376) is None


def test_synthetic_mean_nodes_matches_profile():
    """size_mu is the lognormal's MEAN (mu = log(avg) - sigma^2/2), so the
    generated node counts track the profile's avg_nodes — not overshoot it
    by exp(sigma^2/2) (+38% on DD's sigma=0.8)."""
    from dgcnn_tpu.data.synthetic import PROFILES, synthesize_tu_dataset

    for name in ("DD", "NCI1"):
        gs = synthesize_tu_dataset(name, seed=1)
        got = float(np.diff(gs.node_ptr).mean())
        want = PROFILES[name]["avg_nodes"]
        # clipping at [5, max_nodes] biases slightly; 15% tolerance is far
        # inside the +38% median-as-mean error this pins against
        assert abs(got - want) / want < 0.15, (name, got, want)


def test_synthetic_respects_use_node_attr(tmp_path):
    """use_node_attr=False must drop attr columns on the SYNTHETIC path
    too, and cache separately (the real path's _noattr suffix analogue)."""
    from dgcnn_tpu.data.datasets import load_dataset

    gs_with, _ = load_dataset(
        "PROTEINS", root=str(tmp_path), allow_download=False,
        allow_synthetic=True, use_node_attr=True,
    )
    gs_without, _ = load_dataset(
        "PROTEINS", root=str(tmp_path), allow_download=False,
        allow_synthetic=True, use_node_attr=False,
    )
    assert gs_with.num_features == gs_without.num_features + 1  # 1 attr col


def test_one_hot_noncontiguous_labels_match_pyg_width():
    """PyG min-shifts node labels and one-hots over the FULL [0, max-min]
    range — non-occurring intermediate labels keep (all-zero) columns."""
    from dgcnn_tpu.data.tu_parser import _one_hot

    oh = _one_hot(np.array([2, 5, 2, 7]))
    assert oh.shape == (4, 6)  # labels shift to {0, 3, 5}; width 7-2+1
    np.testing.assert_array_equal(oh.sum(0), [2, 0, 0, 1, 0, 1])


def test_config_rejects_bad_mesh_shape():
    from dgcnn_tpu.config import Config
    import pytest

    with pytest.raises(ValueError, match="mesh_shape"):
        Config(data_type="MUTAG", mesh_shape=(4,))
    with pytest.raises(ValueError, match="mesh_shape"):
        Config(data_type="MUTAG", mesh_shape=(0, 2))


# ---- offline download/extract/verify pipeline (VERDICT r1 #7) ----------


def _write_tiny_tu_zip(zip_dir, name):
    """A minimal valid TU archive: 2 graphs (a triangle and an edge pair),
    node labels, zipped under the top-level <name>/ directory the real
    TU-Dortmund zips use."""
    import io
    import os
    import zipfile

    files = {
        f"{name}_A.txt": "1, 2\n2, 1\n2, 3\n3, 2\n1, 3\n3, 1\n4, 5\n5, 4\n",
        f"{name}_graph_indicator.txt": "1\n1\n1\n2\n2\n",
        f"{name}_graph_labels.txt": "1\n-1\n",
        f"{name}_node_labels.txt": "0\n1\n0\n1\n0\n",
    }
    os.makedirs(zip_dir, exist_ok=True)
    path = os.path.join(zip_dir, f"{name}.zip")
    with zipfile.ZipFile(path, "w") as z:
        for fn, content in files.items():
            z.writestr(f"{name}/{fn}", content)
    return path


def test_download_extract_parse_cache_roundtrip(tmp_path, monkeypatch):
    """Exercise the full _download → extract → parse → cache chain offline
    via a file:// fixture zip (no egress in this environment; the network
    branch differs only in the URL scheme)."""
    from dgcnn_tpu.data import datasets as ds_mod

    name = "MUTAG"
    _write_tiny_tu_zip(str(tmp_path / "zips"), name)
    monkeypatch.setattr(
        ds_mod, "TU_URL", "file://" + str(tmp_path / "zips") + "/{name}.zip"
    )
    root = str(tmp_path / "data")
    # tiny fixture ≠ published MUTAG stats → must WARN loudly, not pass
    with pytest.warns(UserWarning, match="published"):
        gs, meta = load_dataset(name, root=root, allow_download=True)
    assert meta.source == "download"
    assert gs.num_graphs == 2
    assert gs.num_classes == 2
    assert gs.total_edges == 8
    # one-hot(2 labels) + degree column
    assert gs.num_features == 3
    # the parse must have been cached: a second load never re-downloads
    monkeypatch.setattr(ds_mod, "TU_URL", "file:///nonexistent/{name}.zip")
    with pytest.warns(UserWarning, match="published"):
        gs2, meta2 = load_dataset(name, root=root, allow_download=True)
    assert meta2.source == "cache"
    np.testing.assert_array_equal(gs2.x, gs.x)


def test_download_failure_fall_through(tmp_path, monkeypatch):
    """A broken URL (or truncated zip) must return False from _download and
    fall through to the synthetic path when allowed."""
    from dgcnn_tpu.data import datasets as ds_mod

    monkeypatch.setattr(ds_mod, "TU_URL", "file:///nonexistent/{name}.zip")
    gs, meta = load_dataset(
        "MUTAG", root=str(tmp_path), allow_download=True, allow_synthetic=True
    )
    assert meta.source == "synthetic"
    assert gs.num_features == DATASET_STATS["MUTAG"]["num_features"]


def test_download_bad_zip_fall_through(tmp_path, monkeypatch):
    from dgcnn_tpu.data import datasets as ds_mod

    zdir = tmp_path / "zips"
    zdir.mkdir()
    (zdir / "MUTAG.zip").write_bytes(b"this is not a zip file")
    monkeypatch.setattr(
        ds_mod, "TU_URL", "file://" + str(zdir) + "/{name}.zip"
    )
    assert not ds_mod._download(str(tmp_path / "data"), "MUTAG")


def test_stats_mismatch_strict_raises(tmp_path, monkeypatch):
    from dgcnn_tpu.data import datasets as ds_mod

    name = "MUTAG"
    _write_tiny_tu_zip(str(tmp_path / "zips"), name)
    monkeypatch.setattr(
        ds_mod, "TU_URL", "file://" + str(tmp_path / "zips") + "/{name}.zip"
    )
    with pytest.raises(ValueError, match="published"):
        load_dataset(
            name, root=str(tmp_path / "data"), allow_download=True,
            strict_stats=True,
        )


def test_stats_match_passes_quietly():
    """Synthetic datasets reproduce the published (graphs, classes,
    features) exactly — verify_dataset_stats must pass on them."""
    import warnings

    from dgcnn_tpu.data.datasets import verify_dataset_stats
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset

    gs = synthesize_tu_dataset("MUTAG")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert verify_dataset_stats("MUTAG", gs)


def test_fetch_tool_from_zip_ingestion(tmp_path, monkeypatch):
    """tools/fetch_datasets.py --from_zip: the no-egress hand-off path —
    extract, parse, STRICT stats verify, cache. The tiny fixture posing
    as MUTAG must be rejected by strict verification; with matching
    published stats the ingest completes and writes the processed cache."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "fetch_datasets",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "fetch_datasets.py"),
    )
    fetch = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fetch)

    name = "MUTAG"
    zip_path = _write_tiny_tu_zip(str(tmp_path / "zips"), name)
    root = str(tmp_path / "data")
    # strict verification rejects the 2-graph fixture posing as MUTAG
    with pytest.raises(ValueError, match="published"):
        fetch.fetch_one(name, root, from_zip=zip_path)

    # with published stats matching the fixture, the ingest succeeds
    from dgcnn_tpu.data import datasets as ds_mod

    monkeypatch.setitem(
        ds_mod.DATASET_STATS, name,
        dict(num_graphs=2, num_classes=2, num_features=3),
    )
    zip_path = _write_tiny_tu_zip(str(tmp_path / "zips2"), name)
    root2 = str(tmp_path / "data2")
    assert fetch.fetch_one(name, root2, from_zip=zip_path)
    assert os.path.exists(
        os.path.join(root2, name, "processed", f"{name}.npz")
    )


@pytest.mark.slow
def test_dress_rehearsal_full_scale_ingestion(tmp_path):
    """Full-DATASET-SCALE real-data path (VERDICT r2 #4): the synthetic
    NCI1 profile (4,110 graphs, ~123 K nodes, ~270 K edges) written out
    as genuine TU text files, zipped like a TU-Dortmund download,
    ingested through tools/fetch_datasets.py --from_zip with STRICT
    published-stats verification, and reloaded from the cache —
    asserting the round trip is byte-identical to the generated
    GraphSet. This is the same code path a machine with egress runs on
    the real corpus (tools/dress_rehearsal.py docstring has the
    one-command recipe)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "dress_rehearsal",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "dress_rehearsal.py"),
    )
    dr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dr)

    out = dr.run("NCI1", str(tmp_path / "data"), train=False)
    assert out["round_trip"] == "byte_identical"
    assert out["graphs"] == 4110
    assert out["nodes"] > 100_000 and out["edges"] > 200_000


def test_synthetic_signal_knobs_preserve_profile_mean():
    """The degree-only planted-signal knobs (PROFILES `assort` /
    `size_shift` — tools/probe_collab_signal.py sweeps them) must not
    distort the profile's shape statistics: the per-class size shift is
    symmetric around the mean, so avg nodes/graph stays faithful at any
    strength, and the default knob values reproduce the v3 generator
    BIT-IDENTICALLY (no silent dataset change for existing rows)."""
    from dgcnn_tpu.data import synthetic

    base = dict(synthetic.PROFILES["COLLAB"])
    gs_default = synthetic.synthesize_tu_dataset("COLLAB", num_graphs=120,
                                                 seed=7)
    try:
        # explicit defaults == implicit defaults, bit-for-bit
        synthetic.PROFILES["COLLAB"] = dict(base, assort=0.7, size_shift=0.2)
        gs_explicit = synthetic.synthesize_tu_dataset(
            "COLLAB", num_graphs=120, seed=7
        )
        np.testing.assert_array_equal(gs_default.x, gs_explicit.x)
        np.testing.assert_array_equal(gs_default.edge_src, gs_explicit.edge_src)

        # stronger knobs: same mean size (±10%), different structure
        synthetic.PROFILES["COLLAB"] = dict(base, assort=0.9, size_shift=0.3)
        gs_strong = synthetic.synthesize_tu_dataset(
            "COLLAB", num_graphs=120, seed=7
        )
        mean_default = np.diff(gs_default.node_ptr).mean()
        mean_strong = np.diff(gs_strong.node_ptr).mean()
        assert abs(mean_strong - mean_default) / mean_default < 0.10
        assert gs_strong.node_ptr[-1] != gs_default.node_ptr[-1]
    finally:
        synthetic.PROFILES["COLLAB"] = base
