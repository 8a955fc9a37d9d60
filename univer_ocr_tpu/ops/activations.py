"""Elementwise activations (reference layers.py:366-418).

All fuse into neighboring ops under XLA; gradients via autodiff match the
reference's cached-mask backward formulas:
  * relu / leaky_relu: mask is (x >= 0) — note `>=`, so grad at exactly 0
    is 1 (layers.py:379, :396), which `jnp.where(x >= 0, ...)` reproduces;
  * sigmoid backward e^-x/(e^-x+1)^2 == s(x)(1-s(x)) (layers.py:412-415).
"""

import jax.numpy as jnp


def relu(x):
    return jnp.where(x >= 0, x, jnp.zeros_like(x))


def leaky_relu(x, alpha=0.01):
    return jnp.where(x >= 0, x, alpha * x)


def sigmoid(x):
    return 1 / (1 + jnp.exp(-x))
