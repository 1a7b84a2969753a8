"""Mixed-precision (bfloat16 compute) path: fp32 log-probs out, close
agreement with the fp32 forward, and trainability end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.batching.dense import dense_tile, pack_dense_batch
from dgcnn_tpu.config import Config
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.train.cv import run_cross_validation
import pytest


def _models(gs):
    kw = dict(num_features=gs.num_features, num_classes=gs.num_classes)
    return DGCNN(**kw), DGCNN(compute_dtype="bfloat16", **kw)


def test_bf16_forward_close_to_fp32_both_layouts():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=12, seed=3)
    f32, bf16 = _models(gs)
    params = init_params(jax.random.PRNGKey(0), f32)

    coo = pack_batch(gs, np.arange(12), compute_bucket(gs, 12))
    dense = pack_dense_batch(gs, np.arange(12), dense_tile(gs), 16)
    for batch in (jax.device_put(coo), jax.device_put(dense)):
        lp32 = np.asarray(apply(params, f32, batch))[:12]
        lp16 = np.asarray(apply(params, bf16, batch))[:12]
        assert lp16.dtype == np.float32  # log_softmax always fp32
        assert np.isfinite(lp16).all()
        # bf16 has ~3 significant digits; fp32 accumulation keeps the
        # 4-layer network well-behaved
        np.testing.assert_allclose(lp16, lp32, atol=0.08, rtol=0.05)
        # predictions agree on a clear-margin batch
        agree = (lp16.argmax(-1) == lp32.argmax(-1)).mean()
        assert agree >= 0.9, agree


@pytest.mark.slow
def test_bf16_cv_trains(tmp_path):
    gs = synthesize_tu_dataset("MUTAG", num_graphs=40, seed=5)
    cfg = Config(
        data_type="MUTAG",
        batch_size=16,
        num_epochs=5,
        num_folds=2,
        compute_dtype="bfloat16",
        layout="dense",
        data_root=str(tmp_path / "data"),
        epochs_dir=str(tmp_path / "epochs"),
        statistics_dir=str(tmp_path / "statistics"),
    )
    result = run_cross_validation(cfg, dataset=gs)
    # the planted synthetic signal is easy — bf16 must still learn it
    assert result["train_accuracy_mean"] > 60.0
    assert np.isfinite(result["test_accuracy_mean"])
