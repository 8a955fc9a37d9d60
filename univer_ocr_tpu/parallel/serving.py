"""Data-parallel inference: shard page batches over the device mesh.

The OCR cascade's device stages are batch-parallel, so serving scales by
sharding the page batch over the 'data' mesh axis with replicated params —
on a v5e-8 every chunk's front-end (and Line/Char launches) runs 8 pages
wide with XLA inserting no collectives at all (embarrassingly parallel;
ICI is only used if a later stage ever needs cross-page reduction).

`make_sharded_front(front_fn, params, mesh)` wraps any of the pipeline's
jitted stage functions with batch-dim sharding; OCRPipeline accepts
`mesh=` and routes its front-end through it.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_fn_over_batch(fn, mesh, n_batch_args=1):
    """jit `fn(params, *batch_args)` with batch args sharded over 'data'
    and params replicated."""
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    jit_fn = jax.jit(
        fn,
        in_shardings=(replicated,) + (data,) * n_batch_args,
        out_shardings=data,
    )

    def wrapped(params, *batch_args):
        placed = [jax.device_put(jnp.asarray(a), data) for a in batch_args]
        return jit_fn(params, *placed)

    return wrapped


def replicate_params(params, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(jnp.asarray(p), sharding), params)


def shard_cascade_stage(fn, mesh, n_replicated, static_argnums=()):
    """jit a cascade stage for multi-chip serving: the first
    `n_replicated` args (params pytree, the page/crop stack every sample
    may reference) replicate across the mesh; every later per-sample arg
    shards over 'data'.  Outputs shard over 'data' — each chip processes
    its share of the launch batch; XLA inserts the collectives (e.g. the
    all-gather when a data-sharded crop stack from the paragraph stage
    re-enters replicated in the line stage) automatically."""
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))
    static_argnums = tuple(static_argnums)

    jit_cache = {}

    def wrapped(*args):
        statics = tuple(args[i] for i in static_argnums)
        key = (len(args), statics)
        if key not in jit_cache:
            in_sh = tuple(
                replicated if i < n_replicated else data
                for i in range(len(args)) if i not in static_argnums)
            jit_cache[key] = jax.jit(fn, in_shardings=in_sh,
                                     out_shardings=data,
                                     static_argnums=static_argnums)
        placed = []
        for i, a in enumerate(args):
            if i in static_argnums or isinstance(a, dict):
                placed.append(a)
            else:
                placed.append(jax.device_put(
                    jnp.asarray(a),
                    replicated if i < n_replicated else data))
        return jit_cache[key](*placed)

    return wrapped
