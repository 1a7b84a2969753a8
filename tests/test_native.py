"""Native C++ packer: byte-for-byte equality with the NumPy reference
implementation, error paths, and build/dispatch plumbing."""

import dataclasses

import numpy as np
import pytest

from dgcnn_tpu import native
from dgcnn_tpu.batching.packer import BucketSpec, compute_bucket, pack_epoch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize("name", ["MUTAG", "DD", "IMDB-BINARY"])
def test_native_matches_numpy(name):
    gs = synthesize_tu_dataset(name, num_graphs=30, seed=9)
    bucket = compute_bucket(gs, 8)
    order = np.random.default_rng(0).permutation(30)

    ref = pack_epoch(gs, order, 8, bucket, backend="numpy")
    got = pack_epoch(gs, order, 8, bucket, backend="native")
    for f in dataclasses.fields(ref):
        a, b = getattr(ref, f.name), getattr(got, f.name)
        np.testing.assert_array_equal(a, b, err_msg=f"{name}.{f.name}")


def test_native_with_self_loops():
    from dgcnn_tpu.data.graphset import GraphSet

    node_ptr = np.array([0, 3], np.int64)
    edge_src = np.array([0, 1, 1, 2], np.int32)
    edge_dst = np.array([1, 0, 1, 2], np.int32)  # two self-loops
    gs = GraphSet(
        np.ones((3, 2), np.float32), node_ptr, edge_src, edge_dst,
        np.array([0, 4], np.int64), np.array([0], np.int32), 2,
    )
    bucket = BucketSpec(8, 1024, 2)
    ref = pack_epoch(gs, np.array([0]), 1, bucket, backend="numpy")
    got = pack_epoch(gs, np.array([0]), 1, bucket, backend="native")
    assert int(got.edge_mask.sum()) == 2
    np.testing.assert_array_equal(ref.edge_src, got.edge_src)
    np.testing.assert_array_equal(ref.edge_dst, got.edge_dst)


def test_native_bucket_overflow_raises():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=1)
    tiny = BucketSpec(num_nodes=8, num_edges=1024, num_graphs=8)
    with pytest.raises(ValueError, match="native packer failed"):
        pack_epoch(gs, np.arange(8), 8, tiny, backend="native")
