"""Fused Monochrome block kernel: conv3x3(1->16) + LeakyReLU + conv3x3(16->1)
+ sigmoid in a single VMEM-resident pass.

Replaces the reference's two separate conv launches (my_model/model.py
make_monochrome; each a Numba CUDA kernel on its GPU path,
convolutional.py:147-195) and XLA's two conv ops with HBM-materialized
intermediates.  The page is HBM-bandwidth-bound at these channel counts
(1->16->1): fusing removes the 16-channel intermediate (16x the page's
bytes) from HBM entirely.

Layout: channels-first (C, H, W) inside the kernel so the VPU's (8, 128)
tiles map onto spatial rows x columns; the 3x3 convs unroll into 9 shifted
multiply-accumulates.  The grid walks row strips; the (zero-padded) input
stays whole in VMEM (a padded page is ~1.5 MB) and each strip slices its
halo with `pl.ds`.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_ALPHA = 0.01


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, strip_h,
            mid_channels, full_h, full_w):
    # Weights live in SMEM and are read as scalars: TPU vregs tile the
    # last two dims, so each hidden channel is its own 2D plane and every
    # tap is a scalar * plane multiply-add on the VPU (a (mid,1,1)
    # broadcast of a lane vector is an unsupported Mosaic shape cast).
    i = pl.program_id(0)
    th = strip_h
    # x_ref: full padded page (H+4, W+4) in VMEM. Strip i needs rows
    # [i*th, i*th + th+4) to produce out rows [i*th, i*th+th).
    x = x_ref[pl.ds(i * th, th + 4), :]                     # (th+4, W+4)
    wpad = x.shape[1]

    shifts = [[x[ky:ky + th + 2, kx:kx + wpad - 2] for kx in range(3)]
              for ky in range(3)]

    # conv2 must see *zero* padding outside the true image — but conv1's
    # bias and activation make the halo ring nonzero there. Mask h1
    # positions whose global coordinates fall outside [0, H) x [0, W).
    rows = jax.lax.broadcasted_iota(jnp.int32, shifts[0][0].shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shifts[0][0].shape, 1)
    inside = ((i * th - 1 + rows >= 0) & (i * th - 1 + rows < full_h)
              & (cols - 1 >= 0) & (cols - 1 < full_w))

    out = jnp.zeros((th, wpad - 4), dtype=jnp.float32)
    for c in range(mid_channels):
        # conv1 channel c: 3x3 over the 1-channel input, (th+2, W+2)
        h1c = jnp.zeros_like(shifts[0][0])
        for ky in range(3):
            for kx in range(3):
                h1c = h1c + w1_ref[ky * 3 + kx, c] * shifts[ky][kx]
        h1c = h1c + b1_ref[0, c]
        h1c = jnp.where(h1c >= 0, h1c, LEAKY_ALPHA * h1c)
        h1c = jnp.where(inside, h1c, 0.0)
        # conv2 contribution of channel c, (th, W)
        for ky in range(3):
            for kx in range(3):
                out = out + (w2_ref[ky * 3 + kx, c]
                             * h1c[ky:ky + th, kx:kx + wpad - 4])
    out = out + b2_ref[0, 0]
    out_ref[...] = 1.0 / (1.0 + jnp.exp(-out))


def fused_monochrome(x, w1, b1, w2, b2, *, strip_h=64, interpret=False):
    """x: (1, H, W, 1) float32; w1: (3,3,1,16); b1: (16,); w2: (3,3,16,1);
    b2: (1,). Returns (1, H, W, 1) — identical to
    sigmoid(conv(leaky(conv(x, w1)+b1), w2)+b2) with SAME padding."""
    _, H, W, _ = x.shape
    assert H % strip_h == 0, (H, strip_h)
    mid = w1.shape[-1]

    xp = jnp.pad(x[0, :, :, 0], ((2, 2), (2, 2)))           # (H+4, W+4)
    w1f = w1.reshape(9, mid).astype(jnp.float32)
    w2f = w2.reshape(9, mid).astype(jnp.float32)
    b1f = b1.reshape(1, mid).astype(jnp.float32)
    b2f = b2.reshape(1, 1).astype(jnp.float32)

    grid = (H // strip_h,)
    out = pl.pallas_call(
        functools.partial(_kernel, strip_h=strip_h, mid_channels=mid,
                          full_h=H, full_w=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # whole padded page
            pl.BlockSpec(memory_space=pltpu.SMEM),          # scalar weights
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((strip_h, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(xp.astype(jnp.float32), w1f, b1f, w2f, b2f)
    return out[None, :, :, None]


def fused_monochrome_reference(x, w1, b1, w2, b2):
    """XLA-composed reference of the same computation (ops path)."""
    from ... import ops
    h = ops.conv2d(x, w1, b1, padding=(1, 1))
    h = ops.leaky_relu(h, LEAKY_ALPHA)
    h = ops.conv2d(h, w2, b2, padding=(1, 1))
    return ops.sigmoid(h)
