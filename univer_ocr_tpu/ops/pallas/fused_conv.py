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
stays in HBM (`ANY` memory space) and each strip DMAs its rows + 4-row
halo into a VMEM scratch buffer — VMEM residency is one strip, not one
page, so the kernel compiles at arbitrary page sizes (a whole-page-VMEM
variant blew the 16 MB scoped-vmem limit at ~1088x1936 uploads through
the web /ocr endpoint).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_ALPHA = 0.01


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, x_vmem, sem,
            *, strip_h, mid_channels, full_h, full_w):
    # Weights live in SMEM and are read as scalars: TPU vregs tile the
    # last two dims, so each hidden channel is its own 2D plane and every
    # tap is a scalar * plane multiply-add on the VPU (a (mid,1,1)
    # broadcast of a lane vector is an unsupported Mosaic shape cast).
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = strip_h
    # x_hbm: padded pages (B, H+8, W+4) in HBM (2 halo rows on top, 6 on
    # the bottom so every copy length is sublane-aligned). Strip (b, i)
    # needs rows [i*th, i*th + th+4) of page b to produce out rows
    # [i*th, i*th+th); DMA th+8 rows (Mosaic requires slice extents
    # aligned to the (8, 128) tiling) into the VMEM scratch.  The page
    # batch is part of the kernel grid (NOT an outer vmap: batching an
    # ANY-space operand is unsupported in the Mosaic lowering).
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b, 1), pl.ds(i * th, th + 8), :], x_vmem, sem)
    cp.start()
    cp.wait()
    x = x_vmem[0]                                  # (th+8, Wp); rows
    # beyond th+4 and columns beyond W+4 are tiling-alignment slack
    # (zeros), never read

    shifts = [[x[ky:ky + th + 2, kx:kx + full_w + 2] for kx in range(3)]
              for ky in range(3)]

    # conv2 must see *zero* padding outside the true image — but conv1's
    # bias and activation make the halo ring nonzero there. Mask h1
    # positions whose global coordinates fall outside [0, H) x [0, W).
    rows = jax.lax.broadcasted_iota(jnp.int32, shifts[0][0].shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shifts[0][0].shape, 1)
    inside = ((i * th - 1 + rows >= 0) & (i * th - 1 + rows < full_h)
              & (cols - 1 >= 0) & (cols - 1 < full_w))

    out = jnp.zeros((th, full_w), dtype=jnp.float32)
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
                             * h1c[ky:ky + th, kx:kx + full_w])
    out = out + b2_ref[0, 0]
    out_ref[0] = 1.0 / (1.0 + jnp.exp(-out))


def fused_monochrome(x, w1, b1, w2, b2, *, strip_h=64, interpret=False):
    """x: (B, H, W, 1) float32; w1: (3,3,1,16); b1: (16,); w2: (3,3,16,1);
    b2: (1,). Returns (B, H, W, 1) — identical to
    sigmoid(conv(leaky(conv(x, w1)+b1), w2)+b2) with SAME padding.

    The batch is folded into the kernel grid (one launch per chunk, not
    per page) and pages stream HBM -> VMEM strip by strip."""
    B, H, W, _ = x.shape
    assert H % strip_h == 0, (H, strip_h)
    mid = w1.shape[-1]

    # lane (width) dim padded to a 128 multiple: DMA slice extents must
    # align to the (8, 128) memref tiling in both trailing dims
    Wp = -(-(W + 4) // 128) * 128
    xp = jnp.pad(x[:, :, :, 0],
                 ((0, 0), (2, 6), (2, Wp - W - 2)))         # (B, H+8, Wp)
    w1f = w1.reshape(9, mid).astype(jnp.float32)
    w2f = w2.reshape(9, mid).astype(jnp.float32)
    b1f = b1.reshape(1, mid).astype(jnp.float32)
    b2f = b2.reshape(1, 1).astype(jnp.float32)

    grid = (B, H // strip_h)
    out = pl.pallas_call(
        functools.partial(_kernel, strip_h=strip_h, mid_channels=mid,
                          full_h=H, full_w=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),           # pages stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),          # scalar weights
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, strip_h, W), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, strip_h + 8, Wp), jnp.float32),  # strip + halo
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp.astype(jnp.float32), w1f, b1f, w2f, b2f)
    return out[:, :, :, None]


def fused_monochrome_reference(x, w1, b1, w2, b2):
    """XLA-composed reference of the same computation (ops path)."""
    from ... import ops
    h = ops.conv2d(x, w1, b1, padding=(1, 1))
    h = ops.leaky_relu(h, LEAKY_ALPHA)
    h = ops.conv2d(h, w2, b2, padding=(1, 1))
    return ops.sigmoid(h)
