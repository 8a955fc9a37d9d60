"""Nearest-neighbor upsampling.

Forward repeats each pixel `scale_factor` times along H and W — the
reference's Upsample2D CPU path (upsample.py:30-39) and CUDA scatter
(upsample.py:41-75) collapse to one `jnp.repeat` that XLA fuses; autodiff of
the repeat is exactly the reference's block-sum backward (upsample.py:77-110).
"""

import jax.numpy as jnp


def upsample_output_shape(input_shape, scale_factor):
    b, h, w, c = input_shape
    return (b, h * scale_factor, w * scale_factor, c)


def upsample2d(x, scale_factor):
    x = jnp.repeat(x, scale_factor, axis=1)
    x = jnp.repeat(x, scale_factor, axis=2)
    return x
