"""Fully-connected op with the reference's bias-folded weight layout.

The reference FullyConnected (layers.py:307-363) stores a single
(n_in + 1, n_out) matrix whose last row is the bias, and appends a ones
column to the input before the matmul.  We keep that exact layout so
model_weights.json round-trips bit-for-bit; the matmul itself is a single
MXU `jnp.dot`.
"""

import jax.numpy as jnp
from jax import lax

from . import precision as precision_policy


def dense(x, w, *, preferred_dtype=None, precision=None):
    """x: (B, n_in); w: (n_in + 1, n_out) with bias in the last row.

    `preferred_dtype` sets the MXU accumulation type (float32 for bf16
    inputs); None inherits the input dtype (exact for f32/f64 runs).
    `precision`: see ops.conv2d — 'highest' | 'bf16' | None (module default).
    """
    mode = precision_policy.resolve(precision)
    weight, bias_row = w[:-1, :], w[-1, :]
    if mode == 'bf16':
        x = x.astype(jnp.bfloat16)
        weight = weight.astype(jnp.bfloat16)
        mxu_precision = lax.Precision.DEFAULT
        preferred_dtype = jnp.float32
    else:
        mxu_precision = lax.Precision.HIGHEST
    y = jnp.dot(x, weight, preferred_element_type=preferred_dtype,
                precision=mxu_precision)
    return y + bias_row
