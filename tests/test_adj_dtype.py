"""bf16 adjacency STORAGE (Config.adj_dtype): densify rounding, model
consumption without fp32 upcast, config resolution/validation.

On TPU the fp32 matmul's DEFAULT precision rounds operands to bf16 on the
MXU, so a bf16-stored adjacency changes nothing about what the dot
computes (probe: bitwise-equal activations on chip); on CPU the dot really
consumes fp32, so these tests assert closeness, not equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.batching.dense import (
    build_dense_dataset,
    build_dense_dataset_on_device,
    dense_tile,
    gather_dense_batch,
)
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply_dense, init_params


def test_densify_bf16_rounds_fp32_values():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=24, seed=3)
    t = dense_tile(gs)
    ref = build_dense_dataset_on_device(gs, t)
    got = build_dense_dataset_on_device(gs, t, adj_dtype="bfloat16")
    assert got.adj.dtype == jnp.bfloat16
    assert got.x.dtype == jnp.float32  # only the adjacency is rounded
    np.testing.assert_array_equal(
        np.asarray(got.adj, np.float32),
        np.asarray(ref.adj.astype(jnp.bfloat16), np.float32),
        err_msg="bf16 store must be RTNE rounding of the fp32 build",
    )


def test_multi_dense_bf16_storage():
    from dgcnn_tpu.batching.multi_dense import (
        build_multi_dense_on_device,
        plan_tiles,
    )

    gs = synthesize_tu_dataset("DD", num_graphs=12, seed=5)
    tiles = plan_tiles(gs.node_counts(), 16)
    classes, _ = build_multi_dense_on_device(gs, tiles, adj_dtype="bfloat16")
    assert all(c.adj.dtype == jnp.bfloat16 for c in classes)


@pytest.mark.slow
def test_apply_dense_bf16_adj_close_and_fp32_out():
    gs = synthesize_tu_dataset("PROTEINS", num_graphs=16, seed=7)
    t = dense_tile(gs)
    data32 = build_dense_dataset(gs, t)
    data16 = build_dense_dataset_on_device(gs, t, adj_dtype="bfloat16")
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    idx = jnp.arange(8, dtype=jnp.int32)

    b32 = gather_dense_batch(jax.tree_util.tree_map(jnp.asarray, data32), idx)
    b16 = gather_dense_batch(data16, idx)
    out32 = apply_dense(params, model, b32)
    out16 = apply_dense(params, model, b16)
    assert out16.dtype == jnp.float32  # accumulation stays fp32
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.05, atol=0.05
    )
    # and the trunk really consumed bf16 operands: grads still finite/close
    def loss(p, b):
        return -apply_dense(p, model, b).mean()

    g16 = jax.grad(loss)(params, b16)
    g32 = jax.grad(loss)(params, b32)
    gf16 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(g16)]
    )
    gf32 = np.concatenate(
        [np.ravel(x) for x in jax.tree_util.tree_leaves(g32)]
    )
    assert np.all(np.isfinite(gf16))
    np.testing.assert_allclose(gf16, gf32, rtol=0.1, atol=0.05)


@pytest.mark.slow
def test_apply_block_bf16_pool_close():
    """Block engine: a bf16-rounded pool yields close logits and finite,
    close grads (the custom VJP must keep bf16 operands on both sides)."""
    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents,
        build_block_graphset,
        gather_block_batch,
    )
    from dgcnn_tpu.models.dgcnn import apply_block

    gs = synthesize_tu_dataset("DD", num_graphs=10, seed=11)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(1), model)
    dev = jax.device_put(build_block_graphset(gs))
    pool16 = dev.pool.astype(jnp.bfloat16)

    idx = np.arange(6, dtype=np.int32)
    nbb, wb = block_batch_extents(
        np.asarray(dev.nb), np.asarray(dev.block_count), idx[None, :]
    )
    bb = gather_block_batch(dev, jnp.asarray(idx), nbb, wb)

    def loss(p, pool):
        return -apply_block(p, model, bb, pool).mean()

    (l32, g32) = jax.value_and_grad(loss)(params, dev.pool)
    (l16, g16) = jax.value_and_grad(loss)(params, pool16)
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
    f32 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(g32)])
    f16 = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(g16)])
    assert np.all(np.isfinite(f16))
    np.testing.assert_allclose(f16, f32, rtol=0.15, atol=0.05)


@pytest.mark.slow
def test_block_engine_runs_with_explicit_bf16(tmp_path):
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("DD", num_graphs=16, seed=13)
    cfg = Config(
        data_type="DD",
        num_epochs=2,
        batch_size=8,
        num_folds=2,
        layout="block",
        adj_dtype="bfloat16",
        cv_parallel="sequential",
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
    )
    result = run_cross_validation(cfg, dataset=gs)
    accs = result["test_accuracies"]
    assert len(accs) == 2 and all(0.0 <= a <= 100.0 for a in accs)


def test_config_resolution_and_validation():
    cfg = Config(data_type="MUTAG")
    # default is "auto" (flipped after the 2026-08-19 on-chip BITWISE
    # probe + DD step win); on the CPU test backend auto resolves fp32
    # because CPU matmuls consume real fp32
    assert cfg.adj_dtype == "auto"
    assert cfg.resolved_adj_dtype() == "float32"
    assert Config(data_type="MUTAG", adj_dtype="auto").resolved_adj_dtype() \
        == "float32"
    assert Config(data_type="MUTAG", adj_dtype="bfloat16").resolved_adj_dtype() \
        == "bfloat16"
    with pytest.raises(ValueError, match="adj_dtype"):
        Config(data_type="MUTAG", adj_dtype="fp8")


@pytest.mark.parametrize("cv_parallel", ["sequential", "folds"])
@pytest.mark.slow
def test_dense_engine_runs_with_explicit_bf16(tmp_path, cv_parallel):
    """End-to-end: one tiny CV run on the dense engine — sequential and
    fold-lockstep drivers — with bf16 adjacency storage forced (on CPU
    auto would pick fp32)."""
    from dgcnn_tpu.train.cv import run_cross_validation

    gs = synthesize_tu_dataset("MUTAG", num_graphs=20, seed=9)
    cfg = Config(
        data_type="MUTAG",
        num_epochs=2,
        batch_size=8,
        num_folds=2,
        layout="dense",
        adj_dtype="bfloat16",
        cv_parallel=cv_parallel,
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
    )
    result = run_cross_validation(cfg, dataset=gs)
    accs = result["test_accuracies"]
    assert len(accs) == 2 and all(0.0 <= a <= 100.0 for a in accs)
