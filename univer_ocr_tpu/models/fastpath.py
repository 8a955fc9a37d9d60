"""Masked fixed-shape forward paths for the cascade's inference hot loop.

Why: paragraph/line crops have data-dependent shapes, and XLA compiles one
program per shape.  Plain pad-and-trim bucketing is NOT numerically exact
for multi-layer convs — a conv's bias makes the padded region nonzero, and
the next conv's boundary columns read those values instead of the implicit
zero padding the unpadded computation would see.

The fix is masking: zero everything outside the valid region after every
conv.  Then, by induction over layers, the valid region of the padded
computation is bit-for-bit the unpadded computation (conv padding_value is
0 and LeakyReLU(0)=0 throughout this zoo).  The valid extents enter the
jitted function as *traced scalars*, so one compiled program per bucket
shape serves every crop size — and lines batch together into one program
launch per page instead of one per line.

Exactness is asserted against the generic per-shape path in
tests/test_cascade.py.  Weight keys reference the zoo's checkpoint
namespace (models/model.py factories; reference my_model/model.py:137-304).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import ops

LEAKY_ALPHA = 0.01


def _mask_hw(x, h_valid, w_valid):
    """Zero NHWC entries with row >= h_valid or col >= w_valid.

    `h_valid`/`w_valid` are traced scalars or (N,) per-sample vectors.
    """
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    cols = lax.broadcasted_iota(jnp.int32, x.shape, 2)
    hv = jnp.asarray(h_valid).reshape(-1, 1, 1, 1)
    wv = jnp.asarray(w_valid).reshape(-1, 1, 1, 1)
    keep = (rows < hv) & (cols < wv)
    return jnp.where(keep, x, jnp.zeros_like(x))


def _conv(params, key, x, stride=1, padding=2, precision=None):
    p = params[key]
    return ops.conv2d(x, p['w'], p['b'], stride=(stride, stride),
                      padding=(padding, padding), precision=precision)


def _leaky(x):
    return ops.leaky_relu(x, LEAKY_ALPHA)


def line_forward_masked(params, x, h_valid, w_valid, prefix='Line',
                        precision=None):
    """Masked Paragraph/Line FCN forward: x is a bucket-padded (B, H, W, C)
    crop whose true extent is (h_valid, w_valid) (multiples of 4, as
    guaranteed by the /16 crop padding).  Returns the full padded output;
    callers trim to (h_valid, w_valid)."""
    x = _mask_hw(x, h_valid, w_valid)

    x = _leaky(_conv(params, f'{prefix}/down_1/conv_1', x, stride=2,
                     precision=precision))
    h2, w2 = h_valid // 2, w_valid // 2
    x = _mask_hw(x, h2, w2)

    x = _leaky(_conv(params, f'{prefix}/down_2/conv_1', x, stride=2,
                     precision=precision))
    h4, w4 = h_valid // 4, w_valid // 4
    x = _mask_hw(x, h4, w4)

    x = ops.upsample2d(x, 2)
    x = _leaky(_conv(params, f'{prefix}/up_2/conv_block/conv_1', x,
                     precision=precision))
    x = _mask_hw(x, h2, w2)

    x = ops.upsample2d(x, 2)
    x = _leaky(_conv(params, f'{prefix}/up_1/conv_block/conv_1', x,
                     precision=precision))
    x = _mask_hw(x, h_valid, w_valid)

    x = _conv(params, f'{prefix}/end/conv_1', x, precision=precision)
    return ops.sigmoid(x)


def char_forward_masked(params, x, w_valid, precision=None, head='xla',
                        interpret=False):
    """Masked Char forward: x is a (N, 32, W, 1) batch of bucket-padded
    lines, `w_valid` a (N,) vector of true widths.  Returns (N, W,
    len_chars) logits; row (n, j) is valid for j < w_valid[n].

    Mirrors make_char (models/model.py; reference my_model/model.py:271-304):
    conv [64,64,64] k(5,3) p(0,1) s(2,1) -> width->batch unfold(8) ->
    flatten -> dense [1024,128,162].  Height is always exactly 32 (the line
    crops are zoomed to CHAR_INPUT_HEIGHT), so only width needs masking.

    `head='pallas'` runs the unfold + dense chain as the fused MXU kernel
    (ops/pallas/char_head.py): windows gathered from VMEM, three matmuls
    back-to-back, only the logits written to HBM.  Numerics asserted equal
    to the XLA path in tests/test_pallas.py.
    """
    N, H, W, C = x.shape
    wv = w_valid.reshape(N, 1, 1, 1)

    def mask_w(t):
        cols = lax.broadcasted_iota(jnp.int32, t.shape, 2)
        return jnp.where(cols < wv, t, jnp.zeros_like(t))

    x = mask_w(x)
    for i in (1, 2, 3):
        p = params[f'Char/conv_block/conv_{i}']
        x = ops.conv2d(x, p['w'], p['b'], stride=(2, 1), padding=(0, 1),
                       precision=precision)
        x = _leaky(x)
        x = mask_w(x)

    if head == 'pallas':
        from ..ops.pallas.char_head import fused_char_head
        logits = fused_char_head(
            x[:, 0, :, :],
            params['Char/dense_block/dense_1']['w'],
            params['Char/dense_block/dense_2']['w'],
            params['Char/dense_block/dense_3']['w'],
            interpret=interpret)
        return logits

    if head == 'conv':
        # unfold(8) + dense_1 IS a width-8 1D convolution: output column
        # j reads conv-stack columns [j-4, j+4) (unfold_to_fixed_width
        # pads hw=4 left and flattens windows as (dx, c) -> dx*C + c,
        # exactly an HWIO (1, 8, C, D) kernel).  Expressing it as a conv
        # skips the (N*W, 8*C) gathered-window tensor (~128 MB at the
        # fused pool shape) that the gather path materializes in HBM.
        w1 = params['Char/dense_block/dense_1']['w']
        cin = x.shape[-1]
        k1 = w1[:-1].reshape(1, 8, cin, -1)
        x = jnp.pad(x, ((0, 0), (0, 0), (4, 3), (0, 0)))
        x = ops.conv2d(x, k1, w1[-1], stride=(1, 1), padding=(0, 0),
                       precision=precision)                # (N,1,W,D)
        x = _leaky(x)
        x = x.reshape(-1, x.shape[-1])                     # (N*W, D)
        x = ops.dense(x, params['Char/dense_block/dense_2']['w'],
                      precision=precision)
        x = _leaky(x)
        x = ops.dense(x, params['Char/dense_block/dense_3']['w'],
                      precision=precision)
        return x.reshape(N, W, -1)

    x = ops.unfold_to_fixed_width(x, 8)        # (N*W, 1, 8, 64)
    x = x.reshape(x.shape[0], -1)              # flatten

    x = ops.dense(x, params['Char/dense_block/dense_1']['w'],
                  precision=precision)
    x = _leaky(x)
    x = ops.dense(x, params['Char/dense_block/dense_2']['w'],
                  precision=precision)
    x = _leaky(x)
    x = ops.dense(x, params['Char/dense_block/dense_3']['w'],
                  precision=precision)

    return x.reshape(N, W, -1)


def monochrome_forward(params, x, prefix='Monochrome', precision=None):
    """Monochrome conv block [16, out] k3 p1, sigmoid end (reference
    my_model/model.py:108-134).  Fixed page shape — no masking needed."""
    x = _leaky(_conv(params, f'{prefix}/conv_1', x, padding=1,
                     precision=precision))
    x = _conv(params, f'{prefix}/conv_2', x, padding=1, precision=precision)
    return ops.sigmoid(x)


class MaskedPredictor:
    """Shape-bucketed jitted wrapper around a masked forward fn."""

    def __init__(self, forward_fn):
        self._jit = jax.jit(forward_fn)

    def __call__(self, *args):
        return self._jit(*args)


# ---------------------------------------------------------------------------
# Masked TRAINING steps — bucketed shapes, exact per-crop semantics
# ---------------------------------------------------------------------------
#
# Training on variable crop shapes would compile one XLA program per shape
# (minutes each over a remote-compile link).  These steps train on
# bucket-padded crops with masking, reproducing the reference's per-crop
# loss and gradients exactly:
#   * Line/Paragraph (Dice): prediction is masked *after* the final sigmoid
#     (sigmoid(0)=0.5 would otherwise inflate the denominator), target is
#     zero-padded -> per-channel Dice equals the unpadded loss, and invalid
#     positions contribute zero gradient.
#   * Char (SoftmaxCE): zero-padded label rows contribute 0 to the loss sum
#     and have identically-zero logit gradients (sum(g)=0 rows), and the
#     mean is taken over the *true* width, not the padded batch size.

from ..ops.losses import segmentation_dice_2d, softmax_cross_entropy


def masked_line_loss(params, x, y, h_valid, w_valid, prefix='Line',
                     reg_fn=None):
    pred = line_forward_masked(params, x, h_valid, w_valid, prefix=prefix)
    pred = _mask_hw(pred, h_valid, w_valid)
    out_loss = segmentation_dice_2d(pred, y)
    reg = reg_fn(params) if reg_fn is not None else 0.0
    return out_loss + reg, (out_loss, reg, pred)


def masked_char_loss(params, x, y, w_valid, reg_fn=None):
    """x: (1, 32, Wb, C); y: (Wb, n_chars) zero-padded beyond w_valid."""
    logits = char_forward_masked(params, x,
                                 jnp.full((x.shape[0],), w_valid))
    logits = logits.reshape(-1, logits.shape[-1])     # (Wb, n_chars)
    shifted = logits - jnp.max(logits, axis=1, keepdims=True)
    log_probs = shifted - jnp.log(
        jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
    # mean over the true width (reference divides by the real batch size,
    # losses.py:69-71); padded rows are all-zero labels -> 0 contribution.
    out_loss = -jnp.sum(y * log_probs) / w_valid
    reg = reg_fn(params) if reg_fn is not None else 0.0
    return out_loss + reg, (out_loss, reg, logits)


def make_masked_train_step(opt, loss_fn):
    """Generic masked train step factory: jit of value_and_grad + update.

    loss_fn(params, *batch_args) -> (total, (out_loss, reg, pred)).
    Returns step(params, opt_state, lr, *batch_args) ->
    (new_params, new_opt_state, out_loss, reg, pred).
    """
    def step(params, opt_state, lr, *batch_args):
        (_, (out_loss, reg, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, *batch_args)
        new_params, new_opt_state = opt.update(params, grads, opt_state, lr)
        return new_params, new_opt_state, out_loss, reg, pred

    return jax.jit(step, donate_argnums=(0, 1))


def make_masked_eval_step(loss_fn):
    def step(params, *batch_args):
        _, (out_loss, reg, pred) = loss_fn(params, *batch_args)
        return out_loss, reg, pred

    return jax.jit(step)
