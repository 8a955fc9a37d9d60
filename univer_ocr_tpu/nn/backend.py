"""Host<->device staging — the TPU-native analog of the reference's CP switch.

The reference flips a global numpy/cupy alias (`CP`, gpu.py:5-29) and
marshals arrays with `CP.copy`/`CP.asnumpy`.  On TPU the compute path is
always jax/XLA; what remains meaningful is *placement*: which jax device
receives staged arrays (`copy`) and pulling results back to host numpy
(`asnumpy`).  `use_cpu()` keeps everything on the host CPU backend (useful
for debugging and for virtual-device mesh tests); `use_tpu()`/`use_gpu()`
selects the first accelerator.  Kernel launches need no synchronize —
XLA dispatch is async; callers use `block_until_ready` at step boundaries.
"""

import jax
import numpy as np


def _first_device(kind=None):
    devs = jax.devices() if kind is None else jax.devices(kind)
    return devs[0]


class DB:
    """Device backend singleton (API-compatible with reference CP, gpu.py)."""

    device = None            # None = jax default placement
    is_accelerator_used = True

    @staticmethod
    def use_cpu():
        DB.device = _first_device('cpu')
        DB.is_accelerator_used = False

    @staticmethod
    def use_tpu():
        DB.device = jax.devices()[0]
        DB.is_accelerator_used = DB.device.platform != 'cpu'

    # Reference-surface alias (`CP.use_gpu`, gpu.py:15-17): "the accelerator".
    use_gpu = use_tpu

    @staticmethod
    def use_default():
        DB.device = None
        DB.is_accelerator_used = jax.default_backend() != 'cpu'

    @staticmethod
    def copy(obj):
        """Host -> device (reference CP.copy, gpu.py:20-24)."""
        arr = np.asarray(obj)
        if DB.device is None:
            return jax.device_put(arr)
        return jax.device_put(arr, DB.device)

    @staticmethod
    def asnumpy(obj):
        """Device -> host numpy (reference CP.asnumpy, gpu.py:26-29)."""
        return np.asarray(obj)


# Alias with the reference's name for drop-in familiarity.
CP = DB
