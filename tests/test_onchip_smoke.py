"""Compiled-path (real TPU) smoke tests, run in a SUBPROCESS because
tests/conftest.py pins the in-process backend to CPU (ADVICE r1 #2: the
suite exercised kernels/block_pallas.py only in interpret mode, so a
padding regression that breaks only compiled Mosaic lowering would pass
CI). Skipped when no accelerator answers within the probe budget —
the axon tunnel is known to wedge for minutes-to-hours."""

import os
import subprocess
import sys
import textwrap

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_chip(code: str, timeout: int) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=_ROOT,
        capture_output=True, text=True, timeout=timeout,
    )


def _chip_up() -> bool:
    try:
        r = _run_on_chip(
            "import jax, jax.numpy as jnp\n"
            "x = jnp.ones((128, 128))\n"
            "print('UP', float((x @ x).sum()))\n",
            timeout=120,
        )
        return r.returncode == 0 and "UP" in r.stdout
    except subprocess.TimeoutExpired:
        return False


_BLOCK_PALLAS = textwrap.dedent(
    """
    import numpy as np, jax, jax.numpy as jnp
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents, build_block_graphset, gather_block_batch,
    )
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.kernels.block_pallas import block_propagate_pallas
    from dgcnn_tpu.models.dgcnn import block_propagate

    gs = synthesize_tu_dataset("DD", num_graphs=12, seed=7)
    dev = jax.tree_util.tree_map(jnp.asarray, build_block_graphset(gs))
    idx_row = np.full(8, -1, np.int32)
    idx_row[:6] = np.arange(6)
    nb, w = block_batch_extents(
        np.asarray(dev.nb, np.int64),
        np.asarray(dev.block_count, np.int64), idx_row[None],
    )
    batch = gather_block_batch(dev, jnp.asarray(idx_row), nb + 2, w + 5)
    bs = dev.pool.shape[1]
    # non-128-multiple lane dims: F=32 (layer width) and F=1 (layer 4) —
    # exactly the unpadded shapes whose Mosaic tile alignment broke once
    # (and whose padding logic tests/test_block_pallas.py covers only in
    # interpret mode)
    for f in (32, 1):
        hb = jnp.asarray(
            np.random.default_rng(f)
            .standard_normal((int(nb) + 2, bs, f)).astype(np.float32)
        )
        got = block_propagate_pallas(
            hb, dev.pool, batch.item_pool, batch.item_row,
            batch.item_col, batch.item_permT, batch.item_colT, False,
        )
        blocks = dev.pool[batch.item_pool]
        want = block_propagate(
            hb, blocks, batch.item_row, batch.item_col,
            batch.item_permT, batch.item_colT,
        )
        # bf16-grade tolerance: the TPU MXU's DEFAULT precision rounds
        # operands to bf16, and for narrow F XLA may lower the reference
        # einsum to fp32 VPU ops while the kernel's dot stays on the MXU
        # (measured: F=1 diverges ~5e-3 abs, F=32 agrees ~1e-6). This is
        # a LOWERING smoke test — structural bugs (dropped accumulations,
        # misaligned tiles) show up as O(1) errors, not rounding noise.
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )
        print("F", f, "ok")
    print("BLOCK_PALLAS_COMPILED_OK")
    """
)


@pytest.mark.slow
def test_block_pallas_compiled_on_chip():
    if not _chip_up():
        pytest.skip("no accelerator answered the probe (tunnel down?)")
    r = _run_on_chip(_BLOCK_PALLAS, timeout=420)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "BLOCK_PALLAS_COMPILED_OK" in r.stdout, r.stdout


_BLOCK_RESIDENT = textwrap.dedent(
    """
    import numpy as np, jax, jax.numpy as jnp
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    from dgcnn_tpu.batching.block_sparse import (
        block_batch_extents, build_block_graphset, gather_block_batch,
    )
    from dgcnn_tpu.data.synthetic import synthesize_tu_dataset
    from dgcnn_tpu.kernels.block_resident import block_propagate_resident
    from dgcnn_tpu.models.dgcnn import block_propagate

    gs = synthesize_tu_dataset("DD", num_graphs=12, seed=7)
    dev = jax.tree_util.tree_map(jnp.asarray, build_block_graphset(gs))
    idx_row = np.full(8, -1, np.int32)
    idx_row[:6] = np.arange(6)
    nb, w = block_batch_extents(
        np.asarray(dev.nb, np.int64),
        np.asarray(dev.block_count, np.int64), idx_row[None],
    )
    batch = gather_block_batch(dev, jnp.asarray(idx_row), nb + 2, w + 5)
    bs = dev.pool.shape[1]
    for f in (32, 1):
        hb = jnp.asarray(
            np.random.default_rng(f)
            .standard_normal((int(nb) + 2, bs, f)).astype(np.float32)
        )
        got = block_propagate_resident(
            hb, dev.pool, batch.item_pool, batch.item_row,
            batch.item_col, batch.item_permT, batch.item_colT, False,
        )
        blocks = dev.pool[batch.item_pool]
        want = block_propagate(
            hb, blocks, batch.item_row, batch.item_col,
            batch.item_permT, batch.item_colT,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )
        # the custom VJP's transposed-traversal pass through the same
        # compiled kernel
        g = jax.grad(lambda h: (block_propagate_resident(
            h, dev.pool, batch.item_pool, batch.item_row,
            batch.item_col, batch.item_permT, batch.item_colT, False,
        ) ** 2).sum())(hb)
        gw = jax.grad(lambda h: (block_propagate(
            h, blocks, batch.item_row, batch.item_col,
            batch.item_permT, batch.item_colT,
        ) ** 2).sum())(hb)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gw), rtol=5e-2, atol=5e-2
        )
        print("F", f, "ok")
    print("BLOCK_RESIDENT_COMPILED_OK")
    """
)


@pytest.mark.slow
def test_block_resident_compiled_on_chip():
    """The round-5 VMEM-resident kernel (kernels/block_resident.py) must
    keep COMPILING through real Mosaic — it is a non-default measured
    record, and interpret mode alone would let a lowering regression
    (tile alignment, scalar-prefetch index maps) rot silently."""
    if not _chip_up():
        pytest.skip("no accelerator answered the probe (tunnel down?)")
    r = _run_on_chip(_BLOCK_RESIDENT, timeout=420)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "BLOCK_RESIDENT_COMPILED_OK" in r.stdout, r.stdout
