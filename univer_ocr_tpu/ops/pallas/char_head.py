"""Fused Char head kernel: width-unfold(8) + flatten + dense chain
(512 -> 1024 -> 128 -> 162) in one pass.

The generic path materializes the unfolded tensor — every conv-output
column duplicated 8x (reference Conv2DToBatchedFixedWidthed,
convolutional.py:330-373, as a host loop; ops/conv.py as an XLA gather) —
then runs three dense layers with HBM round trips between them.  Here each
W-tile gathers its 8-column windows from VMEM, and the three matmuls run
back-to-back on the MXU with `preferred_element_type=float32`, writing
only the final logits to HBM.

Weights use the zoo's bias-folded layout ((n_in+1, n_out), last row bias —
nn/layers.py FullyConnected).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_ALPHA = 0.01
UNFOLD = 8


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_ALPHA * x)


def _kernel(x_ref, w1_ref, w2_ref, w3_ref, out_ref, *, tile_w, channels):
    t = pl.program_id(1)

    import jax.lax as lax
    # NOTE: ref indices must be explicit non-negative slices — Mosaic
    # SIGABRTs on ref[-1, :] / ref[:-1, :].
    n1, n2, n3 = w1_ref.shape[0], w2_ref.shape[0], w3_ref.shape[0]

    # concat_k(x_shifted_k) @ W1 == sum_k x_shifted_k @ W1[kC:(k+1)C] —
    # the unfold never materializes; each tap is one MXU matmul over the
    # tile's shifted window.
    h = (jnp.zeros((tile_w, w1_ref.shape[1]), jnp.float32)
         + w1_ref[n1 - 1, :])
    for k in range(UNFOLD):
        window = x_ref[0, pl.ds(t * tile_w + k, tile_w), :]  # (tile_w, C)
        h = h + jnp.dot(window,
                        w1_ref[k * channels:(k + 1) * channels, :],
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
    h = _leaky(h)
    h = jnp.dot(h, w2_ref[0:n2 - 1, :],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST) + w2_ref[n2 - 1, :]
    h = _leaky(h)
    logits = jnp.dot(h, w3_ref[0:n3 - 1, :],
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) + w3_ref[n3 - 1, :]
    out_ref[0] = logits


def fused_char_head(x, w1, w2, w3, *, tile_w=64, interpret=False):
    """x: (N, W, C) conv-stack output (height already reduced to 1);
    w1: (C*8+1, 1024); w2: (1025, 128); w3: (129, n_chars).
    Returns (N, W, n_chars) logits == unfold+flatten+dense chain."""
    N, W, C = x.shape
    assert W % tile_w == 0, (W, tile_w)
    n_out = w3.shape[1]

    # Reference zero padding: window j covers columns [j-4, j+4)
    # (ops/conv.py unfold_to_fixed_width).
    hw = UNFOLD // 2
    xp = jnp.pad(x, ((0, 0), (hw, UNFOLD - hw), (0, 0))).astype(jnp.float32)

    grid = (N, W // tile_w)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_w=tile_w, channels=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W + UNFOLD, C), lambda n, t: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_w, n_out), lambda n, t: (n, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, W, n_out), jnp.float32),
        interpret=interpret,
    )(xp, w1.astype(jnp.float32), w2.astype(jnp.float32),
      w3.astype(jnp.float32))
    return out


def fused_char_head_reference(x, w1, w2, w3):
    """XLA-composed reference: unfold + flatten + dense chain (ops path)."""
    from ... import ops
    N, W, C = x.shape
    unfolded = ops.unfold_to_fixed_width(x[:, None, :, :], UNFOLD)
    flat = unfolded.reshape(unfolded.shape[0], -1)
    h = ops.leaky_relu(ops.dense(flat, w1), LEAKY_ALPHA)
    h = ops.leaky_relu(ops.dense(h, w2), LEAKY_ALPHA)
    logits = ops.dense(h, w3)
    return logits.reshape(N, W, -1)
