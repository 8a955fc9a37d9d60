"""Accelerator-vs-CPU parity battery (reference nn/test/test_identity.py).

The reference compared its CPU NumPy path against its CUDA kernels on
shared weights and inputs (:98-132).  The TPU analog: run each layer's
jitted apply on the host CPU backend and on the accelerator with identical
float32 weights/inputs, and assert outputs and input-gradients agree within
1e-5 — the BASELINE.json "per-char outputs match CPU NumPy within 1e-5"
parity gate at layer granularity.

Run as `python test_nn.py test_identity True` (True = use the accelerator;
with False, both sides run on CPU and the check is trivial).
"""

from datetime import datetime as dt

import numpy as np

import jax
import jax.numpy as jnp

from .. import Convolutional2D, MaxPool2D, Upsample2D

passed = 0
failed = 0


def time_it(name, func):
    global passed, failed
    ts = dt.now()
    ok = func()
    elapsed = dt.now() - ts
    status = 'OK' if ok else 'FAIL'
    print(f'  [{status}] {name} ({elapsed})')
    if ok:
        passed += 1
    else:
        failed += 1


def run_on(device, layer, params, X):
    """Forward + sum-loss input gradient of `layer` on `device`."""
    X_d = jax.device_put(jnp.asarray(X, dtype=jnp.float32), device)
    params_d = jax.tree_util.tree_map(
        lambda p: jax.device_put(jnp.asarray(p, dtype=jnp.float32), device),
        params)

    def loss(x):
        return sum(jnp.sum(o) for o in layer.apply(params_d, [x]))

    y = layer.apply(params_d, [X_d])[0]
    dx = jax.jit(jax.grad(loss))(X_d)
    return np.asarray(y), np.asarray(dx)


def check_layer(layer, X, cpu_dev, acc_dev, tol=1e-5):
    layer.initialize_from_X([jnp.asarray(X, dtype=jnp.float32)])
    params = layer.params
    y_cpu, dx_cpu = run_on(cpu_dev, layer, params, X)
    y_acc, dx_acc = run_on(acc_dev, layer, params, X)
    ok = (y_cpu.shape == y_acc.shape and dx_cpu.shape == dx_acc.shape
          and np.allclose(y_cpu, y_acc, rtol=tol, atol=tol)
          and np.allclose(dx_cpu, dx_acc, rtol=tol, atol=tol))
    if not ok:
        print(f'    max |dy| = {np.abs(y_cpu - y_acc).max():.3e}, '
              f'max |ddx| = {np.abs(dx_cpu - dx_acc).max():.3e}')
    return ok


def main(use_gpu=False):
    global passed, failed
    passed = failed = 0

    cpu_dev = jax.devices('cpu')[0] if not use_gpu else None
    try:
        acc_dev = jax.devices()[0]
    except RuntimeError:
        acc_dev = None
    if not use_gpu or acc_dev is None or acc_dev.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
        cpu_dev = acc_dev = jax.devices('cpu')[0]
        print('No accelerator in use — comparing CPU vs CPU (trivial).')
    else:
        cpu_dev = jax.devices('cpu')[0]
        print(f'Comparing CPU vs {acc_dev.device_kind}')

    rs = np.random.RandomState(0)
    # realistic shapes as in the reference (:113): 5x240x320x6
    X = rs.randn(5, 120, 160, 6).astype(np.float32)

    print('Convolutional2D:')
    for cfg in [dict(kernel_size=(3, 3), padding=1),
                dict(kernel_size=(5, 5), padding=2, stride=2),
                dict(kernel_size=(5, 3), padding=(0, 1), stride=(2, 1)),
                dict(kernel_size=(2, 2), padding=(2, 1), padding_value=0.5),
                dict(kernel_size=(4, 4), padding=0, stride=(3, 3))]:
        time_it(f'Conv2D {cfg}', lambda c=cfg: check_layer(
            Convolutional2D(out_channels=4, **c), X, cpu_dev, acc_dev))

    print('MaxPool2D:')
    for cfg in [dict(kernel_size=2),
                dict(kernel_size=(3, 3), stride=(2, 2)),
                dict(kernel_size=2, padding=1),
                dict(kernel_size=(3, 2), padding=(0, 1), ceil_mode=True)]:
        time_it(f'MaxPool2D {cfg}', lambda c=cfg: check_layer(
            MaxPool2D(**c), X, cpu_dev, acc_dev))

    print('Upsample2D:')
    time_it('Upsample2D x2', lambda: check_layer(
        Upsample2D(2), X, cpu_dev, acc_dev))

    print(f'\nPassed: {passed}, Failed: {failed}')
    return failed == 0


if __name__ == '__main__':
    main()
