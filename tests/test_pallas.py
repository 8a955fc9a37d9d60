"""Pallas kernel parity vs XLA-composed references (interpret mode on the
CPU test backend; the compiled TPU path is exercised by bench/predict)."""

import numpy as np
import pytest

import jax.numpy as jnp

from univer_ocr_tpu.ops.pallas import (fused_char_head,
                                       fused_char_head_reference,
                                       fused_monochrome,
                                       fused_monochrome_reference)


def test_fused_monochrome_matches_reference():
    rs = np.random.RandomState(0)
    x = rs.rand(1, 128, 256, 1).astype(np.float32)
    w1 = (rs.rand(3, 3, 1, 16) * 0.3).astype(np.float32)
    b1 = (rs.rand(16) * 0.1).astype(np.float32)
    w2 = (rs.rand(3, 3, 16, 1) * 0.3).astype(np.float32)
    b2 = (rs.rand(1) * 0.1).astype(np.float32)

    got = np.asarray(fused_monochrome(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), interpret=True))
    exp = np.asarray(fused_monochrome_reference(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2)))
    assert got.shape == exp.shape == (1, 128, 256, 1)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_fused_monochrome_with_negatives():
    # exercise the LeakyReLU branch on both sides
    rs = np.random.RandomState(1)
    x = rs.randn(1, 64, 128, 1).astype(np.float32)
    w1 = rs.randn(3, 3, 1, 16).astype(np.float32) * 0.5
    b1 = rs.randn(16).astype(np.float32) * 0.1
    w2 = rs.randn(3, 3, 16, 1).astype(np.float32) * 0.5
    b2 = rs.randn(1).astype(np.float32) * 0.1
    got = np.asarray(fused_monochrome(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), strip_h=32, interpret=True))
    exp = np.asarray(fused_monochrome_reference(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2)))
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_fused_char_head_matches_reference():
    rs = np.random.RandomState(2)
    N, W, C = 2, 128, 64
    x = rs.randn(N, W, C).astype(np.float32) * 0.1
    w1 = rs.randn(C * 8 + 1, 1024).astype(np.float32) * 0.05
    w2 = rs.randn(1025, 128).astype(np.float32) * 0.05
    w3 = rs.randn(129, 162).astype(np.float32) * 0.05

    got = np.asarray(fused_char_head(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(w3),
        interpret=True))
    exp = np.asarray(fused_char_head_reference(
        jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(w3)))
    assert got.shape == (N, W, 162)
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=1e-4)


def test_char_forward_masked_pallas_head_matches_xla():
    """char_forward_masked(head='pallas') == head='xla' through the full
    masked Char forward (the serving pipeline's TPU configuration)."""
    import numpy as np
    import jax.numpy as jnp
    from univer_ocr_tpu.models import make_char
    from univer_ocr_tpu.models.fastpath import char_forward_masked

    model = make_char((1, 496, 64, 1))
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.rand(3, 32, 64, 1).astype(np.float32))
    w_valid = jnp.asarray([64, 40, 8], jnp.int32)

    ref = char_forward_masked(model.params, x, w_valid, head='xla')
    got = char_forward_masked(model.params, x, w_valid, head='pallas',
                              interpret=True)
    # untrained random weights blow logits up to ~1e6; gate on relative
    # error (summation order differs between the fused and XLA paths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-4)


def test_char_forward_masked_conv_head_matches_xla():
    """char_forward_masked(head='conv') == head='xla': the unfold+dense_1
    pair re-expressed as a width-8 1D convolution (no gathered-window
    tensor) must reproduce the gather path's logits."""
    import numpy as np
    import jax.numpy as jnp
    from univer_ocr_tpu.models import make_char
    from univer_ocr_tpu.models.fastpath import char_forward_masked

    model = make_char((1, 496, 64, 1))
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.rand(3, 32, 64, 1).astype(np.float32))
    w_valid = jnp.asarray([64, 40, 8], jnp.int32)

    ref = char_forward_masked(model.params, x, w_valid, head='xla')
    got = char_forward_masked(model.params, x, w_valid, head='conv')
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-4)
