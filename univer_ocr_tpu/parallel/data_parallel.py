"""Multi-chip training steps: data parallelism via shard_map + psum over
ICI, tensor parallelism via GSPMD sharding of the Char dense block.

Design (new — the reference has no distributed compute, SURVEY §2.5):

  * **DP** (`make_dp_train_step`): params/optimizer state replicated, the
    page/line batch sharded over the 'data' mesh axis; each device computes
    its shard's loss and gradients, gradients are `psum`'d over ICI, and
    the (identical) optimizer update runs replicated.  Loss semantics
    extend the reference's batch-1 step to batch-N as the *sum* of
    per-sample losses; the regularization term is scaled by 1/axis_size so
    the psum counts it exactly once.

  * **TP** (`make_tp_char_train_step`): the Char model's dense_1/dense_2
    weights (the only >100k-param tensors in the zoo) are column-sharded
    over the 'model' axis via NamedSharding on a jitted step — XLA GSPMD
    inserts the all-gathers/reduce-scatters.  PP/SP/EP are intentionally
    absent: the cascade's models are a few hundred KB with no sequence
    dimension (SURVEY §2.4, §5.7 document N/A).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from jax import shard_map


def shard_batch(batch, mesh, axis='data'):
    """Place a host batch (leading batch dim) sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


def make_dp_train_step(model, mesh, donate=True):
    """Data-parallel jitted train step for one cascade Model.

    Returns step(params, opt_state, lr, X, y) ->
    (new_params, new_opt_state, out_losses, reg_loss) with X, y batched on
    dim 0 and sharded over mesh axis 'data'.
    """
    opt = model._optimizer()
    assert opt is not None, 'model needs an optimizer for training'
    n_data = mesh.shape['data']

    def local_step(params, opt_state, lr, X, y):
        def loss_fn(p):
            total, (out_losses, reg_loss, preds) = model.loss_fn(p, [X], [y])
            # count regularization once globally (params are replicated)
            total = sum(out_losses) + reg_loss / n_data
            return total, (out_losses, reg_loss)

        (_, (out_losses, reg_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree_util.tree_map(
            lambda g: lax.psum(g, 'data'), grads)
        out_losses = [lax.psum(l, 'data') for l in out_losses]
        new_params, new_opt_state = opt.update(params, grads, opt_state, lr)
        return new_params, new_opt_state, out_losses, reg_loss

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P('data'), P('data')),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def _char_param_spec(layer_name, param_name):
    """TP sharding rule for Char params: column-shard the two wide dense
    matmuls over 'model'; everything else replicated."""
    if param_name == 'w' and (layer_name.endswith('dense_block/dense_1')
                              or layer_name.endswith('dense_block/dense_2')):
        return P(None, 'model')
    return P()


def make_tp_char_train_step(model, mesh):
    """DP x TP jitted train step for the Char model.

    The line batch shards over 'data'; dense_1/dense_2 weights (and their
    optimizer state) shard over 'model'.  Returns
    (step, place_params, place_opt_state): call the placers once to shard
    the host-side pytrees, then step(params, opt_state, lr, X, y).
    """
    opt = model._optimizer()
    assert opt is not None

    def param_shardings(params):
        return {
            ln: {pn: NamedSharding(mesh, _char_param_spec(ln, pn))
                 for pn in params[ln]}
            for ln in params
        }

    def opt_shardings(params, opt_state):
        return {
            ln: {pn: {k: NamedSharding(mesh, _char_param_spec(ln, pn))
                      for k in opt_state[ln][pn]}
                 for pn in opt_state[ln]}
            for ln in opt_state
        }

    data_sharding = NamedSharding(mesh, P('data'))

    def place_params(params):
        sh = param_shardings(params)
        return jax.tree_util.tree_map(
            jax.device_put, dict(params), sh,
            is_leaf=lambda x: not isinstance(x, dict))

    def place_opt_state(params, opt_state):
        sh = opt_shardings(params, opt_state)
        return jax.tree_util.tree_map(
            jax.device_put, opt_state, sh,
            is_leaf=lambda x: not isinstance(x, dict))

    def step(params, opt_state, lr, X, y):
        def loss_fn(p):
            total, (out_losses, reg_loss, preds) = model.loss_fn(p, [X], [y])
            return total, (out_losses, reg_loss)

        (_, (out_losses, reg_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_params, new_opt_state = opt.update(params, grads, opt_state, lr)
        return new_params, new_opt_state, out_losses, reg_loss

    jit_step = jax.jit(step, donate_argnums=(0, 1))

    def wrapped(params, opt_state, lr, X, y):
        X = jax.device_put(jnp.asarray(X), data_sharding)
        y = jax.device_put(jnp.asarray(y), data_sharding)
        return jit_step(params, opt_state, jnp.asarray(lr, jnp.float32), X, y)

    return wrapped, place_params, place_opt_state
