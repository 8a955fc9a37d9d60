"""Optimizers as pure pytree transforms.

Update math matches the reference exactly (optimizers.py:31-98), including
Adam *without* bias correction (optimizers.py:56-61) so that training
trajectories and checkpoints are comparable.  Two deliberate fixes over the
reference (SURVEY §2.9):
  * Adagrad uses `self.lr` — the reference reads a nonexistent `state.lr`
    and crashes (optimizers.py:40);
  * state lives in an explicit pytree owned by the model (not keyed by
    `id(param)` in a global dict), so the whole optimizer step jits and
    donates buffers.

`self.lr` is a mutable host attribute (the Trainer decays it between
epochs, trainer.py:258-260); it enters the jitted step as a traced scalar,
so decay does not trigger recompilation.
"""

import jax
import jax.numpy as jnp

EPS = 1e-8


class BaseOptimizer:
    def __init__(self, lr):
        self.lr = lr

    def init_leaf_state(self, param):
        """Zero state arrays for one parameter tensor."""
        raise NotImplementedError()

    def leaf_update(self, param, grad, state, lr):
        """(param, grad, state, lr) -> (new_param, new_state). Pure."""
        raise NotImplementedError()

    # -- pytree API used by Model's jitted train step ----------------------
    def init_state(self, params):
        return jax.tree_util.tree_map(self.init_leaf_state, params)

    def update(self, params, grads, state, lr):
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_s = treedef.flatten_up_to(state)
        new_p, new_s = [], []
        for p, g, s in zip(flat_p, flat_g, flat_s):
            np_, ns_ = self.leaf_update(p, g, s, lr)
            new_p.append(np_)
            new_s.append(ns_)
        return (jax.tree_util.tree_unflatten(treedef, new_p),
                jax.tree_util.tree_unflatten(treedef, new_s))


class Adagrad(BaseOptimizer):
    def __init__(self, lr=0.01, initial_accumulated=0):
        super().__init__(lr)
        self.initial_accumulated = initial_accumulated

    def init_leaf_state(self, param):
        return {'accumulated': jnp.full_like(param, self.initial_accumulated)}

    def leaf_update(self, param, grad, state, lr):
        acc = state['accumulated'] + grad ** 2
        new_param = param - lr / (jnp.sqrt(acc) + EPS) * grad
        return new_param, {'accumulated': acc}


class Adam(BaseOptimizer):
    """Reference Adam (optimizers.py:47-64): no bias correction."""

    def __init__(self, lr=0.001, beta1=0.9, beta2=0.999,
                 initial_velocity=0, initial_accumulated=0):
        super().__init__(lr)
        self.beta1 = beta1
        self.beta2 = beta2
        self.initial_velocity = initial_velocity
        self.initial_accumulated = initial_accumulated

    def init_leaf_state(self, param):
        return {'velocity': jnp.full_like(param, self.initial_velocity),
                'accumulated': jnp.full_like(param, self.initial_accumulated)}

    def leaf_update(self, param, grad, state, lr):
        vel = self.beta1 * state['velocity'] + (1 - self.beta1) * grad
        acc = self.beta2 * state['accumulated'] + (1 - self.beta2) * grad ** 2
        new_param = param - lr / (jnp.sqrt(acc) + EPS) * vel
        return new_param, {'velocity': vel, 'accumulated': acc}


class Momentum(BaseOptimizer):
    def __init__(self, lr, momentum=0, initial_velocity=0):
        super().__init__(lr)
        self.momentum = momentum
        self.initial_velocity = initial_velocity

    def init_leaf_state(self, param):
        return {'velocity': jnp.full_like(param, self.initial_velocity)}

    def leaf_update(self, param, grad, state, lr):
        vel = self.momentum * state['velocity'] - lr * grad
        return param + vel, {'velocity': vel}


class RMSProp(BaseOptimizer):
    def __init__(self, lr=0.01, rho=0.99, initial_accumulated=0):
        super().__init__(lr)
        self.rho = rho
        self.initial_accumulated = initial_accumulated

    def init_leaf_state(self, param):
        return {'accumulated': jnp.full_like(param, self.initial_accumulated)}

    def leaf_update(self, param, grad, state, lr):
        acc = self.rho * state['accumulated'] + (1 - self.rho) * grad ** 2
        new_param = param - lr / (jnp.sqrt(acc) + EPS) * grad
        return new_param, {'accumulated': acc}
