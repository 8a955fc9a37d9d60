"""Device mesh construction for multi-chip scaling.

The reference is strictly single-device (SURVEY §2.4-2.5: no DP/TP/PP, no
NCCL/MPI); scaling here is new design, not a port: a `jax.sharding.Mesh`
over ICI with data-parallel batch sharding as the primary strategy (the
models are a few hundred KB — replication is free; the batch dimension is
where the work is), plus optional tensor parallelism for the Char model's
dense block (the only layer wide enough to matter).
"""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """Build an ('data', 'model') mesh.

    `model_parallel=1` (default) gives pure data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ('data', 'model'))
