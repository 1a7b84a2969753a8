"""Minimal on-chip probe: does TPU DEFAULT-precision fp32 dot round its
operands to bf16 (RTNE) — i.e. is dot(f32, f32) bitwise equal to
dot(astype(bf16), astype(bf16), preferred_element_type=f32)?

This is the whole correctness claim behind Config.adj_dtype="auto"
(store normalized adjacencies in bf16 on TPU): if true, pre-rounding the
adjacency at rest changes NOTHING the MXU computes while halving its HBM
stream. tools/probe_adj_bf16.py measures the end-to-end speedup at
workload shapes; this probe answers only the bitwise question, in
seconds, on random matrices spanning the exponent range.

Run on the real TPU:  python tools/probe_mxu_rounding.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    d = jax.devices()[0]
    print(f"device: {d.device_kind} ({d.platform})", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    ok_all = True
    for case, (name, scale) in enumerate(
        [("unit", 1.0), ("tiny", 1e-20), ("huge", 1e18)]
    ):
        ka, kx = jax.random.split(jax.random.fold_in(key, case))
        # adjacency-like: nonnegative, many exact zeros (masked), plus a
        # features-like dense rhs with mixed signs
        a = jax.random.uniform(ka, (512, 512), jnp.float32) * scale
        a = jnp.where(a < 0.7 * scale, 0.0, a)
        x = jax.random.normal(kx, (512, 97), jnp.float32) * scale

        @jax.jit
        def both(a, x):
            y32 = jnp.dot(a, x)  # DEFAULT precision, fp32 inputs
            y16 = jax.lax.dot_general(
                a.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return y32, y16

        y32, y16 = jax.device_get(both(a, x))
        eq = np.array_equal(y32, y16)
        ok_all &= eq
        md = float(np.abs(y32 - y16).max())
        print(f"{name:5s} scale={scale:.0e}  bitwise_equal={eq}  max|diff|={md:.3e}",
              file=sys.stderr)

    # batched form, the block engine's einsum shape
    kb = jax.random.fold_in(key, 7)
    blocks = jax.random.uniform(kb, (64, 128, 128), jnp.float32)
    h = jax.random.normal(jax.random.fold_in(key, 8), (64, 128, 32), jnp.float32)

    @jax.jit
    def both_b(b, h):
        y32 = jnp.einsum("wij,wjf->wif", b, h,
                         preferred_element_type=jnp.float32)
        y16 = jnp.einsum("wij,wjf->wif", b.astype(jnp.bfloat16),
                         h.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return y32, y16

    y32, y16 = jax.device_get(both_b(blocks, h))
    eq = np.array_equal(y32, y16)
    ok_all &= eq
    print(f"batched(block-engine shape)  bitwise_equal={eq}  "
          f"max|diff|={float(np.abs(y32 - y16).max()):.3e}", file=sys.stderr)
    print(f"VERDICT: {'BITWISE' if ok_all else 'NOT bitwise'}")


if __name__ == "__main__":
    main()
