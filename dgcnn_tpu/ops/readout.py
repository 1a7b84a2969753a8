"""1-D convolutional readout over sort-pooled node sequences.

Capability-equivalent of the reference readout stack
(reference model.py:18-21,36-40):

    Conv1d(1, c5, kernel=C, stride=C) → ReLU → MaxPool1d(2,2)
    → Conv1d(c5, c6, kernel=w, stride=1) → ReLU → flatten

TPU-first re-design: the first "conv" has kernel == stride == channel
count, i.e. it is one dot product per retained node — we keep the pooled
tensor as [B, k, C] (channels-last) and lower it to a plain matmul on the
MXU instead of an im2col conv. The second conv runs channels-last through
`lax.conv_general_dilated` ('NHC'); the max-pool's window equals its
stride, so it is an exact reshape + pairwise max (round 5 — XLA's
generic reduce_window lowering of the tiny window measured 34% of the
NCI1 fold-lockstep step).

Layout note: we flatten [B, T, c6] time-major, whereas torch flattens
[B, c6, T] channel-major (reference model.py:40) — a fixed permutation of
the following Linear's input, handled by the parity weight converter
(parity/torch_oracle.py) and immaterial for training from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv1d_readout(
    pooled: jax.Array,  # [B, k, C] — in the model's compute dtype
    w5: jax.Array,  # [C, c5] — cast to the compute dtype by the caller
    b5: jax.Array,  # [c5] — fp32 (biases stay fp32 under mixed precision)
    w6: jax.Array,  # [width, c5, c6]  ('HIO') — compute dtype
    b6: jax.Array,  # [c6] — fp32
) -> jax.Array:
    """Returns flattened readout features [B, T*c6]. Matmul/conv operands
    run in `pooled.dtype` with explicit fp32 accumulation — the same
    mixed-precision policy as the GCN stack and the MLP head
    (models/dgcnn.py)."""
    dt = pooled.dtype
    # conv5 == per-node dot product → MXU matmul. [B, k, C] @ [C, c5]
    h = (
        jnp.einsum("bkc,cf->bkf", pooled, w5, preferred_element_type=jnp.float32)
        + b5
    )
    h = jax.nn.relu(h)

    # MaxPool1d(2, 2) over the node axis (reference model.py:20,38).
    # Window == stride → the windows tile the axis, so the pool is an
    # exact reshape + pairwise `where` max. XLA's generic reduce_window
    # lowers catastrophically for this tiny window on TPU: the round-5
    # NCI1 lockstep trace put it at 149 µs/step — 34% of the whole step.
    # `where(h0 >= h1, ...)` (NOT jnp.max) keeps the BACKWARD's
    # tie-routing at select-FIRST — torch's max_pool1d convention and
    # reduce_window's select-and-scatter — where jnp.max's VJP splits
    # the cotangent among ties; degree-only datasets tie constantly
    # (identical node features → identical conv5 rows), and the split
    # measurably shifted 100-epoch accuracy endpoints.
    t2 = (h.shape[1] // 2) * 2
    hp = h[:, :t2].reshape(h.shape[0], t2 // 2, 2, h.shape[2])
    h0, h1 = hp[:, :, 0], hp[:, :, 1]
    h = jnp.where(h0 >= h1, h0, h1)

    # conv6: channels-last 1-D convolution (reference model.py:19,39).
    # Operands share the compute dtype WITHOUT preferred_element_type —
    # jax's conv transpose rule cannot differentiate a mixed-precision
    # conv, and the TPU convolution accumulates in fp32 internally either
    # way; the fp32 bias-add upcasts the result.
    h = jax.lax.conv_general_dilated(
        h.astype(dt),
        w6,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    h = jax.nn.relu(h + b6)

    return h.reshape(h.shape[0], -1)
