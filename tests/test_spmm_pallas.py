"""Pallas SpMM kernel correctness (interpret mode on the CPU test mesh;
the same code path compiles on TPU): forward vs XLA reference, custom VJP
vs autodiff of the XLA path, end-to-end model equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.batching import compute_bucket, pack_batch
from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
from dgcnn_tpu.kernels.spmm_pallas import spmm_pallas
from dgcnn_tpu.models.dgcnn import DGCNN, apply, init_params
from dgcnn_tpu.ops.spmm import spmm_xla


def _random_case(n=64, e=1024, f=32, seed=0, sorted_dst=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    if sorted_dst:
        dst = np.sort(dst)
    w = rng.normal(size=e).astype(np.float32)
    h = rng.normal(size=(n, f)).astype(np.float32)
    return jnp.array(src), jnp.array(dst), jnp.array(w), jnp.array(h)


def test_forward_matches_xla():
    src, dst, w, h = _random_case()
    got = spmm_pallas(src, dst, w, h, True)
    want = spmm_xla(src, dst, w, h, h.shape[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_forward_unsorted_dst_still_correct():
    """Correctness must not depend on the sortedness the packer provides
    (the backward pass swaps src/dst)."""
    src, dst, w, h = _random_case(seed=3, sorted_dst=False)
    got = spmm_pallas(src, dst, w, h, True)
    gathered = np.asarray(h)[np.asarray(src)] * np.asarray(w)[:, None]
    want = np.zeros_like(np.asarray(h))
    np.add.at(want, np.asarray(dst), gathered)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_forward_f1_narrow_features():
    """The conv4 layer has F=1 — the narrowest case the kernel must handle."""
    src, dst, w, h = _random_case(f=1, seed=5)
    got = spmm_pallas(src, dst, w, h, True)
    want = spmm_xla(src, dst, w, h, h.shape[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_xla_grads():
    src, dst, w, h = _random_case(seed=7)

    def f_pallas(w_, h_):
        return (spmm_pallas(src, dst, w_, h_, True) ** 2).sum()

    def f_xla(w_, h_):
        return (spmm_xla(src, dst, w_, h_, h.shape[0]) ** 2).sum()

    gw_p, gh_p = jax.grad(f_pallas, argnums=(0, 1))(w, h)
    gw_x, gh_x = jax.grad(f_xla, argnums=(0, 1))(w, h)
    np.testing.assert_allclose(np.asarray(gh_p), np.asarray(gh_x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=1e-4, atol=1e-5)


def test_model_forward_pallas_equals_xla():
    gs = synthesize_tu_dataset("MUTAG", num_graphs=10, seed=21)
    model = DGCNN(num_features=gs.num_features, num_classes=gs.num_classes)
    params = init_params(jax.random.PRNGKey(0), model)
    batch = jax.device_put(pack_batch(gs, np.arange(10), compute_bucket(gs, 10)))

    lp_xla = apply(params, model, batch, spmm_impl="xla")
    lp_pal = apply(params, model, batch, spmm_impl="pallas")
    np.testing.assert_allclose(
        np.asarray(lp_pal)[:10], np.asarray(lp_xla)[:10], rtol=1e-4, atol=1e-5
    )


def test_spmm_pallas_mxu_matches_xla_and_grads():
    """The MXU selector-tile Pallas variant (dispatched by impl='pallas'
    when its VMEM selectors fit) == segment-sum, values and gradients."""
    import jax

    from dgcnn_tpu.kernels.spmm_pallas import (
        spmm_pallas_mxu,
        spmm_pallas_mxu_fits,
    )
    from dgcnn_tpu.ops.spmm import spmm, spmm_xla

    rng = np.random.default_rng(5)
    n, e, f = 128, 1024, 16
    assert spmm_pallas_mxu_fits(n, f, e)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    w[800:] = 0.0
    h = rng.normal(size=(n, f)).astype(np.float32)
    a = (jnp.array(src), jnp.array(dst), jnp.array(w), jnp.array(h))

    want = np.asarray(spmm_xla(*a, n))
    got = np.asarray(spmm_pallas_mxu(*a, True))  # interpret on CPU
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    via_dispatch = np.asarray(spmm(*a, n, impl="pallas"))
    np.testing.assert_allclose(via_dispatch, want, rtol=1e-5, atol=1e-5)

    gh = jax.grad(lambda hh: spmm_pallas_mxu(a[0], a[1], a[2], hh, True).sum())(a[3])
    gh_x = jax.grad(lambda hh: spmm_xla(a[0], a[1], a[2], hh, n).sum())(a[3])
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_x), rtol=1e-5, atol=1e-5)


def test_spmm_onehot_bf16_and_misaligned_fallback():
    import jax

    from dgcnn_tpu.ops.spmm import spmm, spmm_xla

    rng = np.random.default_rng(6)
    n, f = 64, 8
    # bf16 h through the onehot path: fp32 accumulation, bf16 out
    e = 1024
    src = jnp.array(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.array(np.sort(rng.integers(0, n, e)).astype(np.int32))
    w = jnp.array(rng.normal(size=e).astype(np.float32))
    h16 = jnp.array(rng.normal(size=(n, f)).astype(np.float32)).astype(jnp.bfloat16)
    out = spmm(src, dst, w, h16, n, impl="onehot")
    assert out.dtype == jnp.bfloat16
    want = spmm_xla(src, dst, w, h16, n)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # misaligned stream under impl='onehot' degrades to segment-sum
    e2 = 100
    src2 = jnp.array(rng.integers(0, n, e2).astype(np.int32))
    dst2 = jnp.array(np.sort(rng.integers(0, n, e2)).astype(np.int32))
    w2 = jnp.array(rng.normal(size=e2).astype(np.float32))
    h = jnp.array(rng.normal(size=(n, f)).astype(np.float32))
    got2 = spmm(src2, dst2, w2, h, n, impl="onehot")
    want2 = spmm_xla(src2, dst2, w2, h, n)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5)
