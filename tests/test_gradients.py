"""Numerical-vs-analytic gradient checks for every layer, loss, and model
shape — the port of the reference's test strategy (nn/test/test_gradients.py:
two-point formula, delta=1e-5, tol=1e-4), driven through this framework's
functional API."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from univer_ocr_tpu import nn
from univer_ocr_tpu.nn.gradient_check import (check_gradient,
                                              check_layer_gradient,
                                              check_layer_param_gradient,
                                              check_model_gradient)
from univer_ocr_tpu.ops import kaiming_uniform

RS = np.random.RandomState


def f64(layer_cls, *args, **kwargs):
    kwargs.setdefault('dtype', jnp.float64)
    return layer_cls(*args, **kwargs)


def test_check_gradient_rejects_wrong_grad():
    def bad(x):
        return float(np.sum(x ** 2)), 3 * x  # wrong grad
    assert not check_gradient(bad, RS(0).randn(3, 3))


def test_fully_connected():
    layer = f64(nn.FullyConnected, n_input=4, n_output=3)
    X = RS(1).randn(2, 4)
    assert check_layer_gradient(layer, X)
    assert check_layer_param_gradient(layer, X, 'w')


def test_flatten():
    assert check_layer_gradient(nn.Flatten(), RS(2).randn(2, 3, 4, 2))


@pytest.mark.parametrize('layer_fn', [
    lambda: nn.Relu(),
    lambda: nn.LeakyRelu(0.01),
    lambda: nn.Sigmoid(),
    lambda: nn.Noop(),
])
def test_activations(layer_fn):
    # offset away from 0 so numeric differentiation doesn't cross the kink
    X = RS(3).randn(2, 3, 4, 2) + 0.5
    assert check_layer_gradient(layer_fn(), X)


CONV_CONFIGS = [
    dict(kernel_size=(3, 3), padding=1),
    dict(kernel_size=(3, 3), padding=0),
    dict(kernel_size=(5, 3), padding=(0, 1), stride=(2, 1)),
    dict(kernel_size=(5, 5), padding=2, stride=2),
    dict(kernel_size=(2, 2), padding=(2, 1), padding_value=0.5),
]


@pytest.mark.parametrize('cfg', CONV_CONFIGS)
def test_conv2d_gradients(cfg):
    layer = f64(nn.Convolutional2D, out_channels=2, **cfg)
    X = RS(4).randn(2, 8, 9, 3)
    assert check_layer_gradient(layer, X)
    assert check_layer_param_gradient(layer, X, 'w')
    assert check_layer_param_gradient(layer, X, 'b')


POOL_CONFIGS = [
    dict(kernel_size=2),
    dict(kernel_size=(3, 3), stride=(2, 2)),
    dict(kernel_size=2, padding=1),
    dict(kernel_size=(3, 2), padding=(0, 1), stride=(2, 2), ceil_mode=True),
]


@pytest.mark.parametrize('cfg', POOL_CONFIGS)
def test_maxpool_gradients(cfg):
    layer = nn.MaxPool2D(**cfg)
    X = RS(5).randn(2, 7, 8, 2)
    assert check_layer_gradient(layer, X)


def test_maxpool_tie_splitting():
    """The reference splits gradient equally among tied maxima
    (maxpool.py:81-83) — verify directly on a constant input."""
    X = jnp.ones((1, 2, 2, 1), dtype=jnp.float64)

    def f(x):
        from univer_ocr_tpu import ops
        return jnp.sum(ops.max_pool2d(x, (2, 2), (0, 0), (2, 2), False))

    grad = jax.grad(f)(X)
    np.testing.assert_allclose(np.asarray(grad), 0.25 * np.ones((1, 2, 2, 1)))


def test_upsample_gradients():
    assert check_layer_gradient(nn.Upsample2D(2), RS(6).randn(2, 3, 4, 2))


def test_unfold_gradients():
    assert check_layer_gradient(nn.Conv2DToBatchedFixedWidthed(4),
                                RS(7).randn(1, 3, 9, 2))


def test_concat_gradients():
    layer = nn.Concat()
    Xs = [jnp.asarray(RS(8).randn(2, 3, 4, c)) for c in (2, 3)]

    def f(xs):
        return sum(jnp.sum(o) for o in layer.apply({}, xs))

    grads = jax.grad(f)(Xs)
    for g, x in zip(grads, Xs):
        np.testing.assert_allclose(np.asarray(g), np.ones(x.shape))


@pytest.mark.parametrize('loss', [
    nn.SegmentationDice2D(), nn.SegmentationJaccard2D(),
    nn.SigmoidCrossEntropy(),
])
def test_losses_through_sequential(loss):
    """FCN + segmentation/sigmoid losses incl. input grads (reference
    test_gradients.py:109-128, :207-214)."""
    model = nn.Sequential([
        f64(nn.Convolutional2D, (3, 3), out_channels=2, padding=1),
        nn.Sigmoid(),
    ], loss=loss)
    X = RS(9).rand(1, 6, 6, 1)
    y = (RS(10).rand(1, 6, 6, 2) > 0.5).astype(np.float64)
    assert check_model_gradient(model, X, y)


def test_softmax_ce_through_dense_model():
    model = nn.Sequential([
        nn.Flatten(),
        f64(nn.FullyConnected, n_output=8),
        nn.LeakyRelu(0.01),
        f64(nn.FullyConnected, n_output=4),
    ], loss=nn.SoftmaxCrossEntropy())
    X = RS(11).randn(3, 2, 2, 1)
    y = np.eye(4)[RS(12).randint(0, 4, 3)]
    assert check_model_gradient(model, X, y)


def test_regularized_model():
    model = nn.Sequential([
        f64(nn.Convolutional2D, (3, 3), out_channels=2, padding=1,
            regularizer=nn.L2(0.01)),
        nn.Relu(),
        f64(nn.Convolutional2D, (3, 3), out_channels=1, padding=1,
            regularizer=nn.L1(0.05)),
        nn.Sigmoid(),
    ], loss=nn.SegmentationDice2D())
    X = RS(13).rand(1, 5, 5, 1) + 0.5
    y = (RS(14).rand(1, 5, 5, 1) > 0.5).astype(np.float64)
    assert check_model_gradient(model, X, y)


def test_multi_input_multi_output_dag():
    """Non-sequential DAG: 2 inputs, 2 outputs, shared trunk with fan-out
    (the analog of reference test_gradients.py:225-259)."""
    model = nn.Model(
        layers={
            'conv_a': f64(nn.Convolutional2D, (3, 3), out_channels=2, padding=1),
            'conv_b': f64(nn.Convolutional2D, (3, 3), out_channels=2, padding=1),
            'concat': nn.Concat(),
            'trunk': f64(nn.Convolutional2D, (3, 3), out_channels=2, padding=1),
            'head_1': f64(nn.Convolutional2D, (1, 1), out_channels=1),
            'head_2': f64(nn.Convolutional2D, (1, 1), out_channels=1),
            'sig_1': nn.Sigmoid(),
            'sig_2': nn.Sigmoid(),
        },
        relations={
            'conv_a': 0,
            'conv_b': 1,
            'concat': ['conv_a', 'conv_b'],
            'trunk': 'concat',
            'head_1': 'trunk',
            'head_2': 'trunk',
            'sig_1': 'head_1',
            'sig_2': 'head_2',
            0: 'sig_1',
            1: 'sig_2',
        },
        loss=[nn.SegmentationDice2D(), nn.SegmentationJaccard2D()],
    )
    X = [RS(15).rand(1, 5, 5, 1), RS(16).rand(1, 5, 5, 1)]
    y = [(RS(17).rand(1, 5, 5, 1) > 0.5).astype(np.float64),
         (RS(18).rand(1, 5, 5, 1) > 0.5).astype(np.float64)]
    assert check_model_gradient(model, X, y)


def test_nested_models_with_mixed_regularizers():
    """Nested submodels flattened to parent/child leaves (the analog of
    reference test_gradients.py:261-308)."""
    inner = nn.Model(
        layers={
            'conv_1': f64(nn.Convolutional2D, (3, 3), out_channels=2,
                          padding=1, regularizer=nn.L2(0.02)),
            'act': nn.LeakyRelu(0.01),
        },
        relations={'conv_1': 0, 'act': 'conv_1', 0: 'act'})
    model = nn.Model(
        layers={
            'inner': inner,
            'out': f64(nn.Convolutional2D, (1, 1), out_channels=1,
                       regularizer=nn.L1(0.01)),
            'sig': nn.Sigmoid(),
        },
        relations={'inner': 0, 'out': 'inner', 'sig': 'out', 0: 'sig'},
        loss=nn.SegmentationDice2D())
    assert set(model.layers.keys()) == {'inner/conv_1', 'inner/act', 'out', 'sig'}
    X = RS(19).rand(1, 5, 5, 1) + 0.5
    y = (RS(20).rand(1, 5, 5, 1) > 0.5).astype(np.float64)
    assert check_model_gradient(model, X, y)
