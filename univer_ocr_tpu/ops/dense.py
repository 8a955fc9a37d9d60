"""Fully-connected op with the reference's bias-folded weight layout.

The reference FullyConnected (layers.py:307-363) stores a single
(n_in + 1, n_out) matrix whose last row is the bias, and appends a ones
column to the input before the matmul.  We keep that exact layout so
model_weights.json round-trips bit-for-bit; the matmul itself is a single
MXU `jnp.dot`.
"""

import jax.numpy as jnp
from jax import lax


def dense(x, w, *, preferred_dtype=None):
    """x: (B, n_in); w: (n_in + 1, n_out) with bias in the last row.

    `preferred_dtype` sets the MXU accumulation type (float32 for bf16
    inputs); None inherits the input dtype (exact for f32/f64 runs).
    """
    y = jnp.dot(x, w[:-1, :], preferred_element_type=preferred_dtype,
                precision=lax.Precision.HIGHEST)
    return y + w[-1, :]
