"""Batch packer invariants (the replacement for PyG collation —
reference train.py:108-109)."""

import numpy as np

from dgcnn_tpu.batching import BucketSpec, compute_bucket, pack_batch, pack_epoch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.data.graphset import GraphSet


def test_bucket_covers_worst_case():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=60, seed=0)
    bucket = compute_bucket(gs, batch_size=10)
    # pack the 10 largest graphs — must fit by construction
    worst = np.argsort(gs.node_counts())[::-1][:10]
    pack_batch(gs, worst, bucket)  # must not raise
    assert bucket.num_nodes % 256 == 0
    assert bucket.num_edges % 512 == 0


def test_pack_batch_invariants():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=30, seed=1)
    bucket = compute_bucket(gs, batch_size=8)
    idx = np.array([3, 11, 7, 20, 5])
    b = pack_batch(gs, idx, bucket)

    n_real = int(gs.node_counts()[idx].sum())
    assert b.node_mask.sum() == n_real
    assert b.graph_mask.sum() == len(idx)
    assert int(b.num_graphs) == len(idx)
    # padded nodes carry the out-of-range sentinel graph id
    assert (b.node_graph[n_real:] == bucket.num_graphs).all()
    # edges destination-sorted (CSR-like) among real edges
    e_real = int(b.edge_mask.sum())
    d = b.edge_dst[:e_real]
    assert (np.diff(d) >= 0).all()
    # self-loops stripped (reference model.py:28)
    assert (b.edge_src[:e_real] != b.edge_dst[:e_real]).all()
    # edges only reference real nodes, and stay within their graph
    assert (b.edge_src[:e_real] < n_real).all()
    assert (
        b.node_graph[b.edge_src[:e_real]] == b.node_graph[b.edge_dst[:e_real]]
    ).all()
    # labels land in the right slots
    np.testing.assert_array_equal(b.y[: len(idx)], gs.y[idx])
    # feature rows preserved per graph (first graph in the pack)
    g = idx[0]
    np.testing.assert_allclose(
        b.x[: gs.num_nodes(g)], gs.x[gs.node_ptr[g] : gs.node_ptr[g + 1]]
    )


def test_self_loops_stripped():
    # one graph with an explicit self-loop 1→1
    node_ptr = np.array([0, 3], dtype=np.int64)
    edge_src = np.array([0, 1, 1], dtype=np.int32)
    edge_dst = np.array([1, 0, 1], dtype=np.int32)
    edge_ptr = np.array([0, 3], dtype=np.int64)
    gs = GraphSet(
        np.ones((3, 2), np.float32),
        node_ptr,
        edge_src,
        edge_dst,
        edge_ptr,
        np.array([0], np.int32),
        2,
    )
    bucket = BucketSpec(num_nodes=8, num_edges=8, num_graphs=2)
    b = pack_batch(gs, [0], bucket)
    assert int(b.edge_mask.sum()) == 2


def test_pack_epoch_stacks_batches():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=23, seed=2)
    bucket = compute_bucket(gs, batch_size=10)
    stacked = pack_epoch(gs, np.arange(23), batch_size=10, bucket=bucket)
    assert stacked.x.shape[0] == 3  # 10 + 10 + 3
    assert stacked.graph_mask.sum() == 23
    np.testing.assert_array_equal(
        np.asarray(stacked.num_graphs), np.array([10, 10, 3], np.int32)
    )
