"""Max pooling with the reference's equal-split-among-ties gradient.

The reference MaxPool2D (maxpool.py:24-90) has two quirks that standard
`lax.reduce_window` VJP does NOT reproduce:

  1. zero padding *participates* in the max (maxpool.py:35-39): an
     all-negative window under padding yields 0, not the true max;
  2. the backward pass splits the incoming gradient *equally among all
     tied maxima* (maxpool.py:81-83), while XLA's reduce_window VJP
     routes it to one winner.

We therefore implement the op as `jax.custom_vjp`: forward is a single
`lax.reduce_window` (fused by XLA, runs on the VPU); backward rebuilds the
tie mask from strided slices of the padded input (a static kh*kw loop of
vector ops — no data-dependent control flow) and scatter-adds
`grad * mask / tie_count` back with strided `.at[].add`.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def pool_output_shape(input_shape, kernel_size, padding, stride, ceil_mode):
    """Spatial arithmetic of the reference (maxpool.py:204-216)."""
    batch_size, height, width, channels = input_shape
    kh, kw = kernel_size
    ph, pw = padding
    sh, sw = stride
    ceil = math.ceil if ceil_mode else math.floor
    out_height = ceil((height + 2 * ph - (kh - 1) - 1) / sh + 1)
    out_width = ceil((width + 2 * pw - (kw - 1) - 1) / sw + 1)
    return (batch_size, out_height, out_width, channels)


def _pad_for_pool(x, kernel_size, padding, stride, ceil_mode):
    """Zero-pad like the reference, then -inf-pad so every window fits.

    The zero region matches reference maxpool.py:35-39 (zeros compete in the
    max); the -inf region models the reference's Python-slice clipping under
    ceil_mode (elements beyond the padded array are simply absent).
    Returns the padded array and the output spatial dims.
    """
    b, h, w, c = x.shape
    kh, kw = kernel_size
    ph, pw = padding
    sh, sw = stride
    _, oh, ow, _ = pool_output_shape(x.shape, kernel_size, padding, stride, ceil_mode)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    need_h = (oh - 1) * sh + kh
    need_w = (ow - 1) * sw + kw
    extra_h = max(0, need_h - (h + 2 * ph))
    extra_w = max(0, need_w - (w + 2 * pw))
    if extra_h or extra_w:
        x = jnp.pad(x, ((0, 0), (0, extra_h), (0, extra_w), (0, 0)),
                    constant_values=-jnp.inf)
    return x, oh, ow


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def max_pool2d(x, kernel_size=(2, 2), padding=(0, 0), stride=None, ceil_mode=False):
    """Max pooling over NHWC. `stride` defaults to `kernel_size` (maxpool.py:15)."""
    stride = kernel_size if stride is None else stride
    padded, oh, ow = _pad_for_pool(x, kernel_size, padding, stride, ceil_mode)
    return lax.reduce_window(
        padded, -jnp.inf, lax.max,
        window_dimensions=(1, *kernel_size, 1),
        window_strides=(1, *stride, 1),
        padding='VALID')


def _max_pool2d_fwd(x, kernel_size, padding, stride, ceil_mode):
    y = max_pool2d(x, kernel_size, padding, stride, ceil_mode)
    return y, (x, y)


def _max_pool2d_bwd(kernel_size, padding, stride, ceil_mode, res, g):
    x, y = res
    stride = kernel_size if stride is None else stride
    kh, kw = kernel_size
    ph, pw = padding
    sh, sw = stride
    b, h, w, c = x.shape
    padded, oh, ow = _pad_for_pool(x, kernel_size, padding, stride, ceil_mode)

    def window_slice(arr, ky, kx):
        return lax.slice(
            arr,
            (0, ky, kx, 0),
            (arr.shape[0], ky + sh * (oh - 1) + 1, kx + sw * (ow - 1) + 1, arr.shape[3]),
            (1, sh, sw, 1))

    # Tie mask per window offset: exact equality like the reference CPU path
    # (maxpool.py:50 `submask = i == max_el`).
    masks = [[window_slice(padded, ky, kx) == y for kx in range(kw)] for ky in range(kh)]
    cnt = sum(m.astype(g.dtype) for row in masks for m in row)
    contrib = g / cnt

    dpadded = jnp.zeros_like(padded)
    for ky in range(kh):
        for kx in range(kw):
            upd = jnp.where(masks[ky][kx], contrib, 0.0)
            dpadded = dpadded.at[
                :, ky: ky + sh * (oh - 1) + 1: sh,
                kx: kx + sw * (ow - 1) + 1: sw, :].add(upd)

    # Crop both the reference's zero padding (maxpool.py:85-87) and our
    # -inf ceil-mode extension.
    dx = dpadded[:, ph:ph + h, pw:pw + w, :]
    return (dx,)


max_pool2d.defvjp(_max_pool2d_fwd, _max_pool2d_bwd)
