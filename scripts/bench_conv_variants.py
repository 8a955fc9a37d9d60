"""Compare lowering strategies for the cascade's hot convolutions on
the real device.  The zoo's convs run at single-digit MXU utilization
through lax.conv_general_dilated (bisect_fused_cost round 4: char
forward 11.6ms where the matmul FLOPs predict <1ms), so this times
alternatives at the exact serving shapes:

  conv   : ops.conv2d as shipped (lax.conv_general_dilated)
  shiftmm: conv as sum of kh*kw shifted GEMMs — x[dy,dx] @ W[dy,dx]
           reshaped to (N*H_out*W, Cin) @ (Cin, Cout); every term is a
           large MXU-friendly matmul
  im2col : explicit patch gather -> one (N*H_out*W, kh*kw*Cin) GEMM

    python scripts/bench_conv_variants.py
"""

import sys
import time
from functools import partial

import numpy as np

import _bootstrap  # noqa: F401  (repo-root import shim)


def timed(tag, fn, *args, n=20):
    import jax
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]
                              .ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]
                              .ravel()[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f'{tag:58s} {dt * 1e3:8.2f} ms/rep')
    return dt


def conv_shiftmm(x, w, b, stride, padding):
    """Conv as kh*kw shifted matmuls (bf16 in, f32 accumulation):
    out[n,y,x,:] = sum_{dy,dx} xpad[n, y*sy+dy, x*sx+dx, :] @ w[dy,dx]."""
    import jax.numpy as jnp
    kh, kw, cin, cout = w.shape
    sy, sx = stride
    py, px = padding
    xp = jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0))).astype(
        jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    N, Hp, Wp, C = xp.shape
    Ho = (Hp - kh) // sy + 1
    Wo = (Wp - kw) // sx + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[:, dy:dy + (Ho - 1) * sy + 1:sy,
                    dx:dx + (Wo - 1) * sx + 1:sx, :]
            term = jnp.einsum('nhwc,cd->nhwd', sl, wb[dy, dx],
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc + b


def conv_im2col(x, w, b, stride, padding):
    import jax.numpy as jnp
    kh, kw, cin, cout = w.shape
    sy, sx = stride
    py, px = padding
    xp = jnp.pad(x, ((0, 0), (py, py), (px, px), (0, 0))).astype(
        jnp.bfloat16)
    N, Hp, Wp, C = xp.shape
    Ho = (Hp - kh) // sy + 1
    Wo = (Wp - kw) // sx + 1
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(xp[:, dy:dy + (Ho - 1) * sy + 1:sy,
                           dx:dx + (Wo - 1) * sx + 1:sx, :])
    patches = jnp.concatenate(cols, axis=-1)        # (N,Ho,Wo,kh*kw*C)
    out = jnp.einsum('nhwk,kd->nhwd', patches,
                     w.reshape(kh * kw * cin, cout).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out + b


def main():
    from univer_ocr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from univer_ocr_tpu import ops

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    prec = 'bf16'

    # the three Char convs at the fused pool shape, plus Line conv2
    cases = [
        ('char conv1 (64,32,2048,1)->64 k(5,3) s(2,1)',
         (64, 32, 2048, 1), (5, 3, 1, 64), (2, 1), (0, 1)),
        ('char conv2 (64,14,2048,64)->64', (64, 14, 2048, 64),
         (5, 3, 64, 64), (2, 1), (0, 1)),
        ('char conv3 (64,5,2048,64)->64', (64, 5, 2048, 64),
         (5, 3, 64, 64), (2, 1), (0, 1)),
        ('line conv2 (16,128,256,64)->64 k(5,5) s(2,2)',
         (16, 128, 256, 64), (5, 5, 64, 64), (2, 2), (2, 2)),
    ]
    for tag, xs, ws, stride, pad in cases:
        x = jnp.asarray(rng.rand(*xs).astype(np.float32))
        w = jnp.asarray((rng.rand(*ws) - 0.5).astype(np.float32) * 0.1)
        b = jnp.asarray(np.zeros(ws[-1], np.float32))

        f_conv = jax.jit(lambda x, w, b, _s=stride, _p=pad:
                         ops.conv2d(x, w, b, stride=_s, padding=_p,
                                    precision=prec))
        f_shift = jax.jit(partial(conv_shiftmm, stride=stride,
                                  padding=pad))
        f_im2 = jax.jit(partial(conv_im2col, stride=stride, padding=pad))
        print(f'--- {tag}')
        t0 = timed('  lax conv (shipped)', f_conv, x, w, b)
        t1 = timed('  shift-matmul', f_shift, x, w, b)
        t2 = timed('  im2col', f_im2, x, w, b)
        a = f_conv(x, w, b)
        for name, f in (('shiftmm', f_shift), ('im2col', f_im2)):
            d = float(jnp.max(jnp.abs(f(x, w, b) - a)))
            print(f'  max|{name} - conv| = {d:.5f}')


if __name__ == '__main__':
    main()
