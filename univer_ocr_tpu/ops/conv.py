"""NHWC convolution and the width->batch unfold op.

TPU-first design: the conv lowers to `lax.conv_general_dilated`, which XLA
tiles onto the MXU and fuses with the surrounding bias/activation — this
replaces both the reference's per-output-pixel Python matmul loop
(convolutional.py:90-96) and its Numba CUDA kernels (convolutional.py:147-288).
Constant-value padding (the reference's `padding_value`, convolutional.py:78-82)
is applied explicitly with `jnp.pad` so autodiff reproduces the reference's
"crop dx back to the unpadded region" backward semantics exactly
(convolutional.py:141-142).
"""

import math

import jax
import jax.numpy as jnp
from jax import lax

from . import precision as precision_policy


def conv_output_shape(input_shape, kernel_size, padding, stride, out_channels):
    """Spatial arithmetic of the reference (convolutional.py:290-301)."""
    batch_size, height, width, _ = input_shape
    kh, kw = kernel_size
    ph, pw = padding
    sh, sw = stride
    out_height = math.floor((height + 2 * ph - (kh - 1) - 1) / sh + 1)
    out_width = math.floor((width + 2 * pw - (kw - 1) - 1) / sw + 1)
    return (batch_size, out_height, out_width, out_channels)


def conv2d(x, w, b, *, stride=(1, 1), padding=(0, 0), padding_value=0.0,
           bias=True, preferred_dtype=None, precision=None):
    """2-D convolution, NHWC input, HWIO weights.

    Matches the reference forward (convolutional.py:63-98): constant-value
    padding, VALID window, bias added as `bias_flag * b` (the reference folds
    the bias into the im2col matmul with a `bias * ones` column,
    convolutional.py:87-94 — adding `b` after the conv is algebraically
    identical, including for `bias=False`).

    `precision`: 'highest' (full f32 MXU passes, the 1e-5 parity mode) or
    'bf16' (bf16 inputs, one MXU pass, f32 accumulation — the serving fast
    path); None uses the module default (ops/precision.py).
    """
    mode = precision_policy.resolve(precision)
    ph, pw = padding
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                    constant_values=padding_value)
    if mode == 'bf16':
        x = x.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
        mxu_precision = lax.Precision.DEFAULT
        preferred_dtype = jnp.float32
    else:
        # full f32 MXU precision: the TPU default lowers f32 matmuls to
        # bf16 passes (~1e-2 error), violating the 1e-5 CPU-parity gate
        mxu_precision = lax.Precision.HIGHEST
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred_dtype,
        precision=mxu_precision,
    )
    if bias:
        y = y + b
    return y


def unfold_output_shape(input_shape, width):
    """Shape rule of Conv2DToBatchedFixedWidthed (convolutional.py:362-373)."""
    bs, h, w, ch = input_shape
    assert w >= width, (
        f'Input width must be >= than output width, found: {w} < {width}')
    return (bs * w, h, width, ch)


def unfold_to_fixed_width(x, width):
    """Slide a fixed-width window over W and emit each column as a batch item.

    (B, H, W, C) -> (B*W, H, width, C): output item `b*W + i` is the
    zero-padded window of columns [i - width//2, i + width - width//2) of
    batch item b.  This is the reference's Conv2DToBatchedFixedWidthed
    (convolutional.py:330-373) — its only mechanism for handling
    arbitrary-length text lines — re-expressed as a vectorized gather so the
    host double loop (forward :343-347, overlap-add backward :354-358)
    becomes one XLA gather whose transpose (autodiff) is the overlap-add.
    """
    bs, h, w, ch = x.shape
    hw = width // 2
    # Reference pads with `width` extra zero columns, placing the image at
    # columns [hw, hw + w) (convolutional.py:339-340).
    padded = jnp.pad(x, ((0, 0), (0, 0), (hw, width - hw), (0, 0)))
    # Window i covers padded columns [i, i + width).
    idx = jnp.arange(w)[:, None] + jnp.arange(width)[None, :]   # (w, width)
    y = padded[:, :, idx, :]                                    # (bs, h, w, width, ch)
    y = jnp.moveaxis(y, 2, 1)                                   # (bs, w, h, width, ch)
    return y.reshape(bs * w, h, width, ch)
