"""1-D convolutional readout over sort-pooled node sequences.

Capability-equivalent of the reference readout stack
(reference model.py:18-21,36-40):

    Conv1d(1, c5, kernel=C, stride=C) → ReLU → MaxPool1d(2,2)
    → Conv1d(c5, c6, kernel=w, stride=1) → ReLU → flatten

TPU-first re-design: the first "conv" has kernel == stride == channel
count, i.e. it is one dot product per retained node — we keep the pooled
tensor as [B, k, C] (channels-last) and lower it to a plain matmul on the
MXU instead of an im2col conv. The second conv runs channels-last through
`lax.conv_general_dilated` ('NHC'); the max-pool is a `reduce_window`.

Layout note: we flatten [B, T, c6] time-major, whereas torch flattens
[B, c6, T] channel-major (reference model.py:40) — a fixed permutation of
the following Linear's input, handled by the parity weight converter
(parity/torch_oracle.py) and immaterial for training from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv1d_readout(
    pooled: jax.Array,  # [B, k, C]
    w5: jax.Array,  # [C, c5]
    b5: jax.Array,  # [c5]
    w6: jax.Array,  # [width, c5, c6]  ('HIO')
    b6: jax.Array,  # [c6]
) -> jax.Array:
    """Returns flattened readout features [B, T*c6]."""
    # conv5 == per-node dot product → MXU matmul. [B, k, C] @ [C, c5]
    h = jnp.einsum("bkc,cf->bkf", pooled, w5) + b5
    h = jax.nn.relu(h)

    # MaxPool1d(2, 2) over the node axis (reference model.py:20,38).
    h = jax.lax.reduce_window(
        h,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 1),
        window_strides=(1, 2, 1),
        padding="VALID",
    )

    # conv6: channels-last 1-D convolution (reference model.py:19,39).
    h = jax.lax.conv_general_dilated(
        h,
        w6,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    h = jax.nn.relu(h + b6)

    return h.reshape(h.shape[0], -1)
