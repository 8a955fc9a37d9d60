"""Deterministic global PRNG key sequence for parameter initialization.

The reference initializes weights from global NumPy/CuPy RNG state
(initializers.py); JAX needs explicit keys.  Layers created without an
explicit key draw successive folds of one global seed, so a fixed
`set_global_seed(s)` makes whole-model initialization reproducible.
"""

import jax

_seed = 0
_counter = 0


def set_global_seed(seed):
    global _seed, _counter
    _seed = seed
    _counter = 0


def next_key():
    global _counter
    _counter += 1
    return jax.random.fold_in(jax.random.PRNGKey(_seed), _counter)
