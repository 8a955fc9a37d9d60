"""Op-level parity vs straightforward NumPy implementations of the
reference semantics (the TPU analog of the reference's test_identity.py:
same inputs through the XLA path and a trusted NumPy path, outputs must
match to tight tolerance)."""

import numpy as np
import pytest

import jax.numpy as jnp

from univer_ocr_tpu import ops


def np_conv2d(x, w, b, stride, padding, padding_value, bias=True):
    """Naive NHWC conv with constant-value padding (reference
    convolutional.py:63-98 semantics)."""
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = padding
    sh, sw = stride
    if ph or pw:
        padded = np.full((bsz, h + 2 * ph, wd + 2 * pw, cin), padding_value,
                         dtype=x.dtype)
        padded[:, ph:ph + h, pw:pw + wd, :] = x
        x = padded
    oh = (x.shape[1] - kh) // sh + 1
    ow = (x.shape[2] - kw) // sw + 1
    out = np.zeros((bsz, oh, ow, cout), dtype=np.float64)
    for y in range(oh):
        for xx in range(ow):
            patch = x[:, y * sh:y * sh + kh, xx * sw:xx * sw + kw, :]
            out[:, y, xx, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    if bias:
        out += b
    return out


CONV_CONFIGS = [
    # (kernel, padding, padding_value, stride, bias)
    ((3, 3), (0, 0), 0.0, (1, 1), True),
    ((3, 3), (1, 1), 0.0, (1, 1), True),
    ((3, 3), (1, 1), 1.0, (1, 1), True),
    ((5, 3), (0, 1), 0.0, (2, 1), True),
    ((5, 5), (2, 2), 0.0, (2, 2), True),
    ((2, 2), (2, 2), 0.5, (3, 2), False),
]


@pytest.mark.parametrize('kernel,padding,pv,stride,bias', CONV_CONFIGS)
def test_conv2d_matches_numpy(kernel, padding, pv, stride, bias):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 14, 3)
    w = rng.randn(*kernel, 3, 4)
    b = rng.randn(4)
    expected = np_conv2d(x, w, b, stride, padding, pv, bias)
    got = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     stride=stride, padding=padding, padding_value=pv,
                     bias=bias, preferred_dtype=jnp.float64)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-9, atol=1e-9)
    assert got.shape == ops.conv_output_shape(x.shape, kernel, padding, stride, 4)


def np_maxpool(x, kernel, padding, stride, ceil_mode):
    """Reference maxpool.py:24-57: zero pad participates; slices clip."""
    import math
    bsz, h, w, c = x.shape
    kh, kw = kernel
    ph, pw = padding
    sh, sw = stride
    ceil = math.ceil if ceil_mode else math.floor
    oh = ceil((h + 2 * ph - (kh - 1) - 1) / sh + 1)
    ow = ceil((w + 2 * pw - (kw - 1) - 1) / sw + 1)
    if ph or pw:
        padded = np.zeros((bsz, h + 2 * ph, w + 2 * pw, c), dtype=x.dtype)
        padded[:, ph:ph + h, pw:pw + w, :] = x
        x = padded
    out = np.zeros((bsz, oh, ow, c), dtype=x.dtype)
    for y in range(oh):
        for xx in range(ow):
            win = x[:, y * sh:y * sh + kh, xx * sw:xx * sw + kw, :]
            out[:, y, xx, :] = win.max(axis=(1, 2))
    return out


POOL_CONFIGS = [
    ((2, 2), (0, 0), None, False),
    ((3, 3), (0, 0), (2, 2), False),
    ((2, 2), (1, 1), None, False),
    ((3, 2), (0, 1), (2, 2), True),
    ((4, 4), (0, 0), (3, 3), True),
]


@pytest.mark.parametrize('kernel,padding,stride,ceil_mode', POOL_CONFIGS)
def test_maxpool_matches_numpy(kernel, padding, stride, ceil_mode):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 11, 13, 3)
    eff_stride = kernel if stride is None else stride
    expected = np_maxpool(x, kernel, padding, eff_stride, ceil_mode)
    got = ops.max_pool2d(jnp.asarray(x), kernel, padding, stride, ceil_mode)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, rtol=0, atol=0)


def test_maxpool_padding_zero_wins_over_negatives():
    # All-negative input with padding: reference's zero padding competes in
    # the max, so border outputs are 0 (maxpool.py:35-54).
    x = -np.ones((1, 4, 4, 1))
    got = np.asarray(ops.max_pool2d(jnp.asarray(x), (2, 2), (1, 1), (2, 2), False))
    assert got[0, 0, 0, 0] == 0.0       # corner window includes zero padding
    assert got[0, 1, 1, 0] == -1.0      # interior window is all -1


def test_upsample_matches_numpy():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 4, 5)
    got = np.asarray(ops.upsample2d(jnp.asarray(x), 2))
    expected = x.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_array_equal(got, expected)


def np_unfold(x, width):
    """Reference Conv2DToBatchedFixedWidthed forward (convolutional.py:335-348)."""
    bs, h, w, ch = x.shape
    hw = width // 2
    padded = np.zeros((bs, h, w + width, ch), dtype=x.dtype)
    padded[:, :, hw:-width + hw, :] = x
    y = np.zeros((bs * w, h, width, ch), dtype=x.dtype)
    out_bs = 0
    for in_bs in range(bs):
        for w_id in range(w):
            y[out_bs] = padded[in_bs, :, w_id:w_id + width, :]
            out_bs += 1
    return y


@pytest.mark.parametrize('width', [4, 8])
def test_unfold_matches_numpy(width):
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 17, 3)
    expected = np_unfold(x, width)
    got = np.asarray(ops.unfold_to_fixed_width(jnp.asarray(x), width))
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)


def test_dense_matches_numpy():
    rng = np.random.RandomState(4)
    x = rng.randn(5, 7)
    w = rng.randn(8, 3)
    expected = np.concatenate([x, np.ones((5, 1))], axis=1) @ w
    got = np.asarray(ops.dense(jnp.asarray(x), jnp.asarray(w),
                               preferred_dtype=jnp.float64))
    np.testing.assert_allclose(got, expected, rtol=1e-12)


# ---------------------------------------------------------------------------
# Losses: value AND gradient vs the reference's fused analytic pairs
# (losses.py:9-73), re-derived in NumPy here.
# ---------------------------------------------------------------------------

def np_dice(pred, gt):
    eps = 1e-8
    num = (pred * gt).sum(axis=(1, 2), keepdims=True) + eps
    den = pred.sum(axis=(1, 2), keepdims=True) + gt.sum(axis=(1, 2), keepdims=True) + 2 * eps
    loss = np.sum(1 - 2 * num / den)
    grad = -2 * (gt * den - num) / den ** 2
    return loss, grad


def np_jaccard(pred, gt):
    eps = 1e-8
    num = (pred * gt).sum(axis=(1, 2), keepdims=True) + eps
    den = (pred.sum(axis=(1, 2), keepdims=True)
           + gt.sum(axis=(1, 2), keepdims=True) - num + 2 * eps)
    loss = np.sum(1 - num / den)
    grad = -(gt * den - num * (1 - gt)) / den ** 2
    return loss, grad


def np_sigmoid_ce(pred, gt):
    bs = gt.shape[0]
    p = 1 / (1 + np.exp(-pred))
    loss = -np.sum(gt * np.log(p) + (1 - gt) * np.log(1 - p)) / bs
    grad = (gt * (p - 1) + (1 - gt) * p) / bs
    return loss, grad


def np_softmax_ce(pred, gt):
    bs = gt.shape[0]
    e = np.exp(pred - pred.max(axis=1, keepdims=True))
    sm = e / e.sum(axis=1, keepdims=True)
    loss = -np.sum(gt * np.log(sm)) / bs
    grad = (sm - gt) / bs
    return loss, grad


import jax


@pytest.mark.parametrize('jax_fn,np_fn,seg', [
    (ops.segmentation_dice_2d, np_dice, True),
    (ops.segmentation_jaccard_2d, np_jaccard, True),
    (ops.sigmoid_cross_entropy, np_sigmoid_ce, True),
    (ops.softmax_cross_entropy, np_softmax_ce, False),
])
def test_loss_value_and_grad_parity(jax_fn, np_fn, seg):
    rng = np.random.RandomState(5)
    if seg:
        pred = rng.rand(2, 6, 7, 3)
        gt = (rng.rand(2, 6, 7, 3) > 0.5).astype(np.float64)
    else:
        pred = rng.randn(9, 11)
        gt = np.eye(11)[rng.randint(0, 11, size=9)]
    exp_loss, exp_grad = np_fn(pred, gt)
    got_loss, got_grad = jax.value_and_grad(jax_fn)(jnp.asarray(pred),
                                                    jnp.asarray(gt))
    np.testing.assert_allclose(float(got_loss), exp_loss, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_grad), exp_grad,
                               rtol=1e-8, atol=1e-10)


def test_regularizers():
    rng = np.random.RandomState(6)
    w = rng.randn(4, 5)
    l1_loss, l1_grad = jax.value_and_grad(
        lambda x: ops.l1_regularizer(x, 0.1))(jnp.asarray(w))
    np.testing.assert_allclose(float(l1_loss), 0.1 * np.abs(w).sum(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(l1_grad), 0.1 * np.sign(w), rtol=1e-12)
    l2_loss, l2_grad = jax.value_and_grad(
        lambda x: ops.l2_regularizer(x, 0.1))(jnp.asarray(w))
    np.testing.assert_allclose(float(l2_loss), 0.1 * (w ** 2).sum(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(l2_grad), 0.2 * w, rtol=1e-12)


def test_initializers_shapes_and_ranges():
    import jax.random as jr
    key = jr.PRNGKey(0)
    for fn in [ops.xavier_normal, ops.xavier_uniform,
               ops.kaiming_normal, ops.kaiming_uniform]:
        w = fn(key, 10, 4)
        assert w.shape == (10, 4)
    # reference quirk: uniform variants are non-negative (initializers.py:10-13)
    w = ops.kaiming_uniform(key, 100, 10)
    assert float(jnp.min(w)) >= 0.0
