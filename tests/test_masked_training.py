"""Masked bucketed training must equal per-shape training exactly: same
loss values and same parameter updates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univer_ocr_tpu.models import make_char, make_line
from univer_ocr_tpu.models.fastpath import (make_masked_eval_step,
                                            make_masked_train_step,
                                            masked_char_loss,
                                            masked_line_loss)
from univer_ocr_tpu.nn.optimizers import Adam
from univer_ocr_tpu.primitives import CHARS

PAGE = (1, 496, 736, 1)


def host_copy(params):
    return jax.tree_util.tree_map(lambda p: np.array(p), params)


def test_masked_line_train_step_matches_generic():
    from functools import partial
    rs = np.random.RandomState(0)
    h, w = 96, 112
    X = rs.rand(1, h, w, 1).astype(np.float32)
    y = (rs.rand(1, h, w, 2) > 0.5).astype(np.float32)

    model_a = make_line(PAGE, Adam(lr=1e-3))
    params0 = host_copy(model_a.params)
    losses_a = model_a.train(X, y)

    model_b = make_line(PAGE, Adam(lr=1e-3))
    model_b.set_weights({ln: {pn: params0[ln][pn].tolist()
                              for pn in params0[ln]} for ln in params0})
    loss_fn = partial(masked_line_loss, prefix='Line',
                      reg_fn=model_b.regularization_fn)
    opt = model_b._optimizer()
    step = make_masked_train_step(opt, loss_fn)

    hb, wb = 128, 128
    xp = np.zeros((1, hb, wb, 1), np.float32)
    xp[:, :h, :w, :] = X
    yp = np.zeros((1, hb, wb, 2), np.float32)
    yp[:, :h, :w, :] = y
    params = model_b.params
    opt_state = opt.init_state(params)
    new_params, _, out_loss, reg, pred = step(
        params, opt_state, jnp.float32(1e-3),
        jnp.asarray(xp), jnp.asarray(yp),
        jnp.asarray(h, jnp.int32), jnp.asarray(w, jnp.int32))

    np.testing.assert_allclose(float(out_loss),
                               losses_a['output_losses'][0], rtol=1e-5)
    np.testing.assert_allclose(float(reg),
                               losses_a['regularization_loss'], rtol=1e-5)
    for ln in new_params:
        for pn in new_params[ln]:
            np.testing.assert_allclose(
                np.asarray(new_params[ln][pn]),
                np.asarray(model_a.params[ln][pn]),
                rtol=1e-4, atol=1e-6, err_msg=f'{ln}/{pn}')


def test_masked_char_train_step_matches_generic():
    from functools import partial
    rs = np.random.RandomState(1)
    w = 50
    X = rs.rand(1, 32, w, 1).astype(np.float32)
    y = np.eye(len(CHARS), dtype=np.float32)[rs.randint(0, len(CHARS), w)]

    model_a = make_char(PAGE, Adam(lr=1e-3))
    params0 = host_copy(model_a.params)
    losses_a = model_a.train(X, y)

    model_b = make_char(PAGE, Adam(lr=1e-3))
    model_b.set_weights({ln: {pn: params0[ln][pn].tolist()
                              for pn in params0[ln]} for ln in params0})
    loss_fn = partial(masked_char_loss, reg_fn=model_b.regularization_fn)
    opt = model_b._optimizer()
    step = make_masked_train_step(opt, loss_fn)

    wb = 64
    xp = np.zeros((1, 32, wb, 1), np.float32)
    xp[:, :, :w, :] = X
    yp = np.zeros((wb, len(CHARS)), np.float32)
    yp[:w, :] = y
    params = model_b.params
    opt_state = opt.init_state(params)
    new_params, _, out_loss, reg, logits = step(
        params, opt_state, jnp.float32(1e-3),
        jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(w, jnp.int32))

    np.testing.assert_allclose(float(out_loss),
                               losses_a['output_losses'][0], rtol=1e-4)
    for ln in new_params:
        for pn in new_params[ln]:
            np.testing.assert_allclose(
                np.asarray(new_params[ln][pn]),
                np.asarray(model_a.params[ln][pn]),
                rtol=1e-3, atol=1e-5, err_msg=f'{ln}/{pn}')


def test_masked_eval_matches_generic():
    from functools import partial
    rs = np.random.RandomState(2)
    h, w = 64, 80
    X = rs.rand(1, h, w, 1).astype(np.float32)
    y = (rs.rand(1, h, w, 2) > 0.5).astype(np.float32)
    model = make_line(PAGE, Adam(lr=1e-3))
    ref = model.test(X, y)['output_losses'][0]

    loss_fn = partial(masked_line_loss, prefix='Line',
                      reg_fn=model.regularization_fn)
    ev = make_masked_eval_step(loss_fn)
    xp = np.zeros((1, 128, 128, 1), np.float32)
    xp[:, :h, :w, :] = X
    yp = np.zeros((1, 128, 128, 2), np.float32)
    yp[:, :h, :w, :] = y
    out_loss, reg, pred = ev(model.params, jnp.asarray(xp), jnp.asarray(yp),
                             jnp.asarray(h, jnp.int32), jnp.asarray(w, jnp.int32))
    np.testing.assert_allclose(float(out_loss), ref, rtol=1e-5)
