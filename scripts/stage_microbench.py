"""Compute-vs-transfer split for the device-cascade stage programs.

Times, for each line_shape_menu entry: the paragraph-stage program
(compute only, block_until_ready), the packed-bands D2H, and the
line-stage program + ids D2H.  Distinguishes device compute, transfer
bandwidth and per-call RTT on the tunneled TPU.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    fn()                                   # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


def main():
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    from univer_ocr_tpu.models.pipeline import OCRPipeline
    from univer_ocr_tpu.models.model import CHAR_INPUT_HEIGHT

    weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    shape = (1, 496, 736, 1)
    pipe = OCRPipeline(shape, weights=weights, chunk=8, workers=8,
                       device_cascade=True, precision='bf16')
    H, W = shape[1], shape[2]
    mono_dev = jnp.asarray(np.random.rand(8, H, W, 1).astype(np.float32))
    padded_dev = jax.block_until_ready(pipe._pad_stack(mono_dev))

    B = pipe.DEVICE_BATCH
    params = pipe.line_model.params
    for hb, wb in pipe.line_shape_menu:
        blob = np.zeros((B, hb, wb // 8), np.uint8)
        blob[:, :hb - 16, :(wb - 16) // 8] = 0xFF
        args = (params, padded_dev, jnp.asarray(blob),
                jnp.zeros((B,), jnp.int32),
                jnp.full((B,), pipe.STACK_PAD, jnp.int32),
                jnp.full((B,), pipe.STACK_PAD, jnp.int32),
                jnp.full((B,), hb - 16, jnp.int32),
                jnp.full((B,), wb - 16, jnp.int32))
        dt, (crops, packed) = timeit(
            lambda: jax.block_until_ready(
                pipe._paragraph_stage_fast(*args)))
        nbytes = np.prod(packed.shape)
        dt_pull, _ = timeit(lambda: np.asarray(packed))
        print(f'para_fast menu=({hb},{wb}): compute {dt * 1e3:.1f}ms, '
              f'bands D2H {dt_pull * 1e3:.1f}ms for {nbytes / 1e3:.0f}KB '
              f'({nbytes / dt_pull / 1e6:.1f}MB/s)')

    # line stage on the largest-menu crop stack
    cparams = pipe.char_model.params
    for wc in pipe.CHAR_WIDTH_MENU:
        largs = (cparams, crops, jnp.zeros((B,), jnp.int32),
                 jnp.full((B,), 0.5, jnp.float32),
                 jnp.full((B,), 0.5, jnp.float32),
                 jnp.full((B,), wc, jnp.int32),
                 jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                 jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                 jnp.full((B,), wc, jnp.int32),
                 CHAR_INPUT_HEIGHT, wc)
        dt, ids = timeit(
            lambda: jax.block_until_ready(pipe._line_stage(*largs)))
        dt_pull, _ = timeit(lambda: np.asarray(ids))
        nbytes = np.prod(ids.shape)
        print(f'line_stage wc={wc}: compute {dt * 1e3:.1f}ms, ids D2H '
              f'{dt_pull * 1e3:.1f}ms for {nbytes / 1e3:.0f}KB '
              f'({nbytes / dt_pull / 1e6:.1f}MB/s)')

    # pure RTT: pull a 1-byte array
    one = jax.block_until_ready(jnp.zeros((1,), jnp.uint8))
    dt_rtt, _ = timeit(lambda: np.asarray(one), n=10)
    print(f'1-byte D2H RTT: {dt_rtt * 1e3:.1f}ms')


if __name__ == '__main__':
    main()
