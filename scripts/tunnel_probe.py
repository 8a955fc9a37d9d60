"""Characterize the tunneled TPU's D2H path: single-transfer bandwidth
vs many concurrent small pulls vs serial small pulls."""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def main():
    import jax
    import jax.numpy as jnp
    print('devices:', jax.devices(), file=sys.stderr)

    key = jax.random.PRNGKey(0)

    def fresh(nbytes):
        # fresh random content each time so no host-copy caching
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.block_until_ready(
            jax.random.randint(sub, (nbytes,), 0, 255, jnp.uint8))

    pool = ThreadPoolExecutor(max_workers=32)

    for label, sizes in [
        ('1 x 16MB', [16 << 20]),
        ('1 x 4MB', [4 << 20]),
        ('8 x 512KB serial', [512 << 10] * 8),
        ('8 x 512KB concurrent', [512 << 10] * 8),
        ('32 x 32KB serial', [32 << 10] * 32),
        ('32 x 32KB concurrent', [32 << 10] * 32),
        ('32 x 1KB concurrent', [1 << 10] * 32),
    ]:
        arrays = [fresh(s) for s in sizes]
        total = sum(sizes)
        t0 = time.perf_counter()
        if 'concurrent' in label:
            futs = [pool.submit(np.asarray, a) for a in arrays]
            for f in futs:
                f.result()
        else:
            for a in arrays:
                np.asarray(a)
        dt = time.perf_counter() - t0
        print(f'{label}: {dt * 1e3:.1f}ms total, '
              f'{total / dt / 1e6:.1f}MB/s')

    # H2D for reference
    host = np.random.randint(0, 255, (4 << 20,), np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(host))
    dt = time.perf_counter() - t0
    print(f'H2D 1 x 4MB: {dt * 1e3:.1f}ms, {len(host) / dt / 1e6:.1f}MB/s')


if __name__ == '__main__':
    main()
