"""L1/L2 regularization penalties (reference regularizations.py:15-26).

Pure scalar fns; `jax.grad` reproduces the reference's analytic grads
(sign(w) * strength and 2 * strength * w).
"""

import jax.numpy as jnp


def l1_regularizer(weights, reg_strength):
    return reg_strength * jnp.sum(jnp.abs(weights))


def l2_regularizer(weights, reg_strength):
    return reg_strength * jnp.sum(weights ** 2)
