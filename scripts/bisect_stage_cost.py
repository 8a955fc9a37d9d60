"""Bisect the device-cascade stage programs: time each jitted sub-piece
separately to find what actually costs 30ms."""

import json
import os
import sys
import time
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def timeit(fn, *args, n=10):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from univer_ocr_tpu.models import device_cascade as dc
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.fastpath import (char_forward_masked,
                                                line_forward_masked)
    from univer_ocr_tpu.models.model import make_char, make_line

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    line = make_line((1, 496, 736, 1))
    char = make_char((1, 496, 736, 1))
    line.set_weights(weights)
    char.set_weights(weights)

    B, HB, WB = 16, 512, 768
    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.rand(B, HB, WB, 1).astype(np.float32))
    hv = jnp.full((B,), HB - 16, jnp.int32)
    wv = jnp.full((B,), WB - 16, jnp.int32)
    padded = jnp.asarray(rng.rand(8, HB + 16 + 512, WB + 16 + 768, 1)
                         .astype(np.float32))
    blob_bits = jnp.asarray(
        rng.randint(0, 256, (B, HB, WB // 8)).astype(np.uint8))
    pidx = jnp.zeros((B,), jnp.int32)
    sy = jnp.full((B,), 16, jnp.int32)

    # 2. line forward alone (bf16)
    f = jax.jit(partial(line_forward_masked, prefix='Line',
                        precision='bf16'))
    print(f'line_forward_masked bf16 (16,512,768): '
          f'{timeit(f, line.params, crops, hv, wv) * 1e3:.2f}ms')

    # 3. band masks (forward + threshold + packbits)
    f = jax.jit(partial(dc._band_masks, precision='bf16'))
    print(f'_band_masks bf16: '
          f'{timeit(f, line.params, crops, hv, wv) * 1e3:.2f}ms')

    # 4. packbits alone
    mask = jnp.asarray(rng.rand(B, HB, WB, 2) > 0.7)
    f = jax.jit(lambda m: jnp.packbits(m.astype(jnp.uint8), axis=2))
    print(f'packbits (16,512,768,2): {timeit(f, mask) * 1e3:.2f}ms')

    # 5. unpackbits + blob multiply
    f = jax.jit(lambda bb, c: c * jnp.unpackbits(bb, axis=2)[..., None]
                .astype(jnp.float32))
    print(f'unpackbits+mul: {timeit(f, blob_bits, crops) * 1e3:.2f}ms')

    # 6. jnp.take along axis 0
    f = jax.jit(lambda c, i: jnp.take(c[:, :, :, 0], i, axis=0))
    print(f'take(axis=0) 16x(512,768): '
          f'{timeit(f, crops, pidx) * 1e3:.2f}ms')

    # 7. zoomed_line_crops_matmul alone
    wc = 2048
    largs = (crops, pidx,
             jnp.full((B,), 0.5, jnp.float32), jnp.full((B,), 0.5,
                                                        jnp.float32),
             jnp.full((B,), wc, jnp.int32),
             jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    f = jax.jit(partial(dc.zoomed_line_crops_matmul, out_h=32, out_w=wc,
                        precision='bf16'), static_argnames=())
    print(f'zoomed_line_crops_matmul wc=2048: '
          f'{timeit(f, *largs) * 1e3:.2f}ms')

    # 8. char forward alone
    lines = jnp.asarray(rng.rand(B, 32, wc, 1).astype(np.float32))
    wvc = jnp.full((B,), wc, jnp.int32)
    f = jax.jit(partial(char_forward_masked, precision='bf16', head='xla'))
    print(f'char_forward_masked xla wc=2048: '
          f'{timeit(f, char.params, lines, wvc) * 1e3:.2f}ms')
    f = jax.jit(partial(char_forward_masked, precision='bf16',
                        head='pallas'))
    print(f'char_forward_masked pallas wc=2048: '
          f'{timeit(f, char.params, lines, wvc) * 1e3:.2f}ms')

    # 9. rotated gather path
    mono = jnp.asarray(rng.rand(8, 496, 736, 1).astype(np.float32))
    rargs = (mono, blob_bits, pidx,
             sy, sy, jnp.full((B,), 400, jnp.int32),
             jnp.full((B,), 600, jnp.int32),
             jnp.full((B,), 0.99, jnp.float32),
             jnp.full((B,), 0.14, jnp.float32),
             jnp.full((B,), 3.0, jnp.float32),
             jnp.full((B,), -2.0, jnp.float32),
             jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.full((B,), 400, jnp.int32), jnp.full((B,), 600, jnp.int32),
             jnp.full((B,), 4, jnp.int32), jnp.full((B,), 4, jnp.int32))
    f = jax.jit(dc.rotated_paragraph_crops)
    print(f'rotated_paragraph_crops (bilinear gather): '
          f'{timeit(f, *rargs, n=3) * 1e3:.2f}ms')


if __name__ == '__main__':
    main()
