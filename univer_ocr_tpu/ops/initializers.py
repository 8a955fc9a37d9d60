"""Weight initializers (reference initializers.py:4-25).

Same math as the reference, including its quirk that the *uniform* variants
sample from [0, 1) (asymmetric, not centered) — kept because checkpoints
trained either way must behave identically, and the reference's default for
every layer is `kaiming_uniform` (layers.py:29).  Symmetric corrected
variants are provided under `*_symmetric` names for new models.

Functional difference from the reference: explicit PRNG keys instead of
global NumPy state — required for reproducibility under jit and across
hosts.
"""

import jax
import jax.numpy as jnp


def xavier_normal(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num)
    return a * jax.random.normal(key, (in_num, out_num), dtype)


def xavier_uniform(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num)
    return a * jax.random.uniform(key, (in_num, out_num), dtype)


def kaiming_normal(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num / 2)
    return a * jax.random.normal(key, (in_num, out_num), dtype)


def kaiming_uniform(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num / 2)
    return a * jax.random.uniform(key, (in_num, out_num), dtype)


def kaiming_uniform_symmetric(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num / 2)
    return a * (2 * jax.random.uniform(key, (in_num, out_num), dtype) - 1)


def xavier_uniform_symmetric(key, in_num, out_num, dtype=jnp.float32):
    a = 1 / jnp.sqrt(in_num)
    return a * (2 * jax.random.uniform(key, (in_num, out_num), dtype) - 1)
