"""Batched / data-parallel curriculum training (models/dp_train.py):
the batched step must apply exactly the accumulated per-sample gradients
of the reference's batch-1 loop, and the mesh-sharded step must equal
the single-device batched step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from univer_ocr_tpu.models.dp_train import (collect_stage_samples,
                                            make_batched_seg_step,
                                            make_batched_char_step,
                                            make_batches,
                                            train_stage_batched)
from univer_ocr_tpu.models.model import Modes, make_line, make_char
from univer_ocr_tpu.nn.optimizers import Adam
from univer_ocr_tpu.ops.losses import segmentation_dice_2d
from univer_ocr_tpu.models.fastpath import (line_forward_masked, _mask_hw,
                                            char_forward_masked)

SHAPE = (1, 64, 64, 1)


def _line_batch(rs, B=4, hb=64, wb=64):
    X = rs.rand(B, hb, wb, 1).astype(np.float32)
    y = (rs.rand(B, hb, wb, 2) > 0.7).astype(np.float32)
    hv = np.array([32, 48, 64, 16][:B], np.int32)
    wv = np.array([64, 32, 48, 16][:B], np.int32)
    for b in range(B):                       # respect the padding contract
        X[b, hv[b]:, :, :] = 0
        X[b, :, wv[b]:, :] = 0
        y[b, hv[b]:, :, :] = 0
        y[b, :, wv[b]:, :] = 0
    weight = np.array([1, 1, 1, 0][:B], np.float32)
    return X, y, hv, wv, weight


def test_batched_seg_step_equals_accumulated_per_sample():
    rs = np.random.RandomState(0)
    model = make_line(SHAPE, optimizer=Adam(lr=1e-3))
    params = model.params
    opt = model._optimizer()
    opt_state = opt.init_state(params)
    X, y, hv, wv, weight = _line_batch(rs)

    train_step, _ = make_batched_seg_step(model, 'Line', donate=False)
    new_params, _, per = train_step(
        params, opt_state, jnp.float32(1e-3), X, y, hv, wv, weight)

    # manual: sum of per-sample grads (weight 0 sample excluded) + reg
    def sample_loss(p, i):
        pred = line_forward_masked(p, X[i:i + 1], hv[i], wv[i],
                                   prefix='Line')
        pred = _mask_hw(pred, hv[i], wv[i])
        return segmentation_dice_2d(pred, y[i:i + 1])

    grads = None
    for i in range(3):                        # weight[3] == 0
        g = jax.grad(sample_loss)(params, i)
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)
    # the batched step trains on the weighted MEAN (per-sample gradient
    # scale); reg is added once per step undivided
    grads = jax.tree_util.tree_map(lambda g: g / 3.0, grads)
    reg_g = jax.grad(model.regularization_fn)(params)
    grads = jax.tree_util.tree_map(jnp.add, grads, reg_g)
    exp_params, _ = opt.update(params, grads, opt.init_state(params),
                               jnp.float32(1e-3))

    for name in params:
        for k in params[name]:
            np.testing.assert_allclose(
                np.asarray(new_params[name][k]),
                np.asarray(exp_params[name][k]), rtol=1e-5, atol=1e-7)
    # filler sample's reported loss is zeroed
    assert float(np.asarray(per)[3]) == 0.0


def test_batched_seg_step_dp_mesh_equals_single_device():
    if jax.device_count() < 4:
        pytest.skip('needs the virtual multi-device mesh')
    rs = np.random.RandomState(1)
    mesh = Mesh(np.array(jax.devices()[:4]), ('data',))
    model = make_line(SHAPE, optimizer=Adam(lr=1e-3))
    params = model.params
    opt_state = model._optimizer().init_state(params)
    X, y, hv, wv, weight = _line_batch(rs)

    single, _ = make_batched_seg_step(model, 'Line', donate=False)
    p1, _, per1 = single(params, opt_state, jnp.float32(1e-3),
                         X, y, hv, wv, weight)
    sharded, _ = make_batched_seg_step(model, 'Line', mesh=mesh,
                                       donate=False)
    p2, _, per2 = sharded(params, opt_state, jnp.float32(1e-3),
                          X, y, hv, wv, weight)
    np.testing.assert_allclose(np.asarray(per1), np.asarray(per2),
                               rtol=1e-5, atol=1e-7)
    for name in params:
        for k in params[name]:
            np.testing.assert_allclose(np.asarray(p1[name][k]),
                                       np.asarray(p2[name][k]),
                                       rtol=1e-5, atol=1e-6)


def test_batched_char_step_runs_and_masks_fillers():
    rs = np.random.RandomState(2)
    model = make_char(SHAPE, optimizer=Adam(lr=1e-3))
    B, wb, n = 4, 128, 162
    X = rs.rand(B, 32, wb, 1).astype(np.float32)
    y = np.zeros((B, wb, n), np.float32)
    for b in range(B):
        for col in range(0, 100, 3):
            y[b, col, rs.randint(1, n)] = 1.0
    wv = np.array([100, 64, 80, 8], np.int32)
    weight = np.array([1, 1, 1, 0], np.float32)
    train_step, eval_step = make_batched_char_step(model, donate=False)
    params = model.params
    opt_state = model._optimizer().init_state(params)
    new_params, _, per = train_step(params, opt_state, jnp.float32(1e-3),
                                    X, y, wv, weight)
    per = np.asarray(per)
    assert per[3] == 0.0 and (per[:3] > 0).all()
    # and the per-sample loss matches the fastpath masked_char_loss
    from univer_ocr_tpu.models.fastpath import masked_char_loss
    _, (l0, _, _) = masked_char_loss(params, X[0:1], y[0], int(wv[0]))
    np.testing.assert_allclose(per[0], float(l0), rtol=1e-5)


def test_collect_and_train_line_stage_reduces_loss():
    """End to end on generated pages: materialize Line samples once,
    train a few batched epochs, loss must drop."""
    import random
    from univer_ocr_tpu.models.datasets import GeneratorDataset
    random.seed(5)
    np.random.seed(5)
    ds = GeneratorDataset(2, 320, 256)
    samples = collect_stage_samples(Modes.TRAIN_LINE, ds)
    assert samples, 'generator produced no paragraphs'
    x, y = samples[0]
    assert x.ndim == 4 and y.shape[3] == 2

    model, best = train_stage_batched(
        Modes.TRAIN_LINE, samples, samples[:2], {}, epochs=3,
        lr=3e-3, lr_step=0.995, batch=4, input_shape=(1, 256, 320, 1),
        log=lambda *a: None)
    _, init = train_stage_batched(
        Modes.TRAIN_LINE, samples, samples[:2], {}, epochs=0,
        lr=3e-3, lr_step=0.995, batch=4, input_shape=(1, 256, 320, 1),
        log=lambda *a: None)
    assert best < init


def test_make_batches_shapes_and_weights():
    rs = np.random.RandomState(3)
    samples = [(rs.rand(1, 40, 100, 1).astype(np.float32),
                rs.rand(1, 40, 100, 2).astype(np.float32))
               for _ in range(5)]
    batches = make_batches(samples, Modes.TRAIN_LINE, batch=4)
    assert len(batches) == 2
    for X, y, hv, wv, weight in batches:
        # 40x100 fits the smallest serving-menu entry (128, 256)
        assert X.shape == (4, 128, 256, 1)
        assert ((hv == 40) & (wv == 100)).all()
    assert batches[0][4].sum() + batches[1][4].sum() == 5
