"""Regularizer classes (surface parity with reference regularizations.py).

`.fn(weights)` is the pure penalty used inside jitted steps; `__call__`
returns the reference's fused `(float(loss), grad)` pair.
"""

import jax
import jax.numpy as jnp

from ..ops.regularizers import l1_regularizer, l2_regularizer


class BaseRegularizer:
    def __init__(self, reg_strength):
        self.reg_strength = float(reg_strength)

    def fn(self, weights):
        raise NotImplementedError()

    def __call__(self, weights):
        w = jnp.asarray(weights)
        loss, grad = jax.value_and_grad(self.fn)(w)
        return float(loss), grad

    def __repr__(self):
        return f'{type(self).__name__}({self.reg_strength})'


class L1(BaseRegularizer):
    def fn(self, weights):
        return l1_regularizer(weights, self.reg_strength)


class L2(BaseRegularizer):
    def fn(self, weights):
        return l2_regularizer(weights, self.reg_strength)
