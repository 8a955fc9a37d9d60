"""Script-style gradient-check battery (reference nn/test/test_gradients.py).

Run as `python test_nn.py test_gradients [use_gpu]` — prints a pass counter
and per-check wall time.  The pytest suite (tests/test_gradients.py) covers
the same ground for CI; this runner preserves the reference's interactive
surface (incl. launching from the web UI).
"""

from datetime import datetime as dt

import numpy as np

import jax.numpy as jnp

from .. import (L1, L2, Concat, Conv2DToBatchedFixedWidthed, Convolutional2D,
                Flatten, FullyConnected, LeakyRelu, MaxPool2D, Model, Noop,
                Relu, SegmentationDice2D, SegmentationJaccard2D, Sequential,
                Sigmoid, SigmoidCrossEntropy, SoftmaxCrossEntropy, Upsample2D)
from ..gradient_check import (check_layer_gradient,
                              check_layer_param_gradient,
                              check_model_gradient)

passed = 0
failed = 0


def time_it(name, func):
    global passed, failed
    ts = dt.now()
    ok = func()
    elapsed = dt.now() - ts
    status = 'OK' if ok else 'FAIL'
    print(f'  [{status}] {name} ({elapsed})')
    if ok:
        passed += 1
    else:
        failed += 1


def f64(layer_cls, *args, **kwargs):
    kwargs.setdefault('dtype', jnp.float64)
    return layer_cls(*args, **kwargs)


def main(use_gpu=False):
    import jax
    if not use_gpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    global passed, failed
    passed = failed = 0
    rs = np.random.RandomState(0)
    X4 = rs.randn(2, 8, 9, 3)
    X2 = rs.randn(3, 5)

    print('Layer input gradients:')
    time_it('FullyConnected', lambda: check_layer_gradient(
        f64(FullyConnected, n_input=5, n_output=4), X2))
    time_it('Flatten', lambda: check_layer_gradient(Flatten(), X4))
    time_it('Relu', lambda: check_layer_gradient(Relu(), X4 + 0.5))
    time_it('LeakyRelu', lambda: check_layer_gradient(LeakyRelu(0.01), X4 + 0.5))
    time_it('Sigmoid', lambda: check_layer_gradient(Sigmoid(), X4))
    time_it('Noop', lambda: check_layer_gradient(Noop(), X4))
    time_it('Upsample2D', lambda: check_layer_gradient(Upsample2D(2), X4))
    time_it('Unfold', lambda: check_layer_gradient(
        Conv2DToBatchedFixedWidthed(4), X4))

    print('Conv2D configurations:')
    for cfg in [dict(kernel_size=(3, 3), padding=1),
                dict(kernel_size=(3, 3), padding=0),
                dict(kernel_size=(5, 3), padding=(0, 1), stride=(2, 1)),
                dict(kernel_size=(5, 5), padding=2, stride=2),
                dict(kernel_size=(2, 2), padding=(2, 1), padding_value=0.5)]:
        layer = f64(Convolutional2D, out_channels=2, **cfg)
        time_it(f'Conv2D {cfg} dX', lambda l=layer: check_layer_gradient(l, X4))
        layer = f64(Convolutional2D, out_channels=2, **cfg)
        time_it(f'Conv2D {cfg} dw', lambda l=layer:
                check_layer_param_gradient(l, X4, 'w'))
        layer = f64(Convolutional2D, out_channels=2, **cfg)
        time_it(f'Conv2D {cfg} db', lambda l=layer:
                check_layer_param_gradient(l, X4, 'b'))

    print('MaxPool2D configurations:')
    for cfg in [dict(kernel_size=2),
                dict(kernel_size=(3, 3), stride=(2, 2)),
                dict(kernel_size=2, padding=1),
                dict(kernel_size=(3, 2), padding=(0, 1), stride=(2, 2),
                     ceil_mode=True)]:
        time_it(f'MaxPool2D {cfg}', lambda c=cfg: check_layer_gradient(
            MaxPool2D(**c), X4))

    print('Losses through models (incl. input gradients):')
    rs2 = np.random.RandomState(1)
    Xs = rs2.rand(1, 6, 6, 1)
    ys = (rs2.rand(1, 6, 6, 2) > 0.5).astype(np.float64)
    for loss in [SegmentationDice2D(), SegmentationJaccard2D(),
                 SigmoidCrossEntropy()]:
        model = Sequential([
            f64(Convolutional2D, (3, 3), out_channels=2, padding=1),
            Sigmoid(),
        ], loss=loss)
        time_it(f'FCN + {type(loss).__name__}',
                lambda m=model: check_model_gradient(m, Xs, ys))

    model = Sequential([
        Flatten(),
        f64(FullyConnected, n_output=8),
        LeakyRelu(0.01),
        f64(FullyConnected, n_output=4),
    ], loss=SoftmaxCrossEntropy())
    Xd = rs2.randn(3, 2, 2, 1)
    yd = np.eye(4)[rs2.randint(0, 4, 3)]
    time_it('Dense + SoftmaxCE', lambda: check_model_gradient(model, Xd, yd))

    print('Regularized + multi-IO DAG:')
    dag = Model(
        layers={
            'conv_a': f64(Convolutional2D, (3, 3), out_channels=2, padding=1,
                          regularizer=L2(0.01)),
            'conv_b': f64(Convolutional2D, (3, 3), out_channels=2, padding=1,
                          regularizer=L1(0.02)),
            'concat': Concat(),
            'head_1': f64(Convolutional2D, (1, 1), out_channels=1),
            'head_2': f64(Convolutional2D, (1, 1), out_channels=1),
            'sig_1': Sigmoid(),
            'sig_2': Sigmoid(),
        },
        relations={
            'conv_a': 0, 'conv_b': 1, 'concat': ['conv_a', 'conv_b'],
            'head_1': 'concat', 'head_2': 'concat',
            'sig_1': 'head_1', 'sig_2': 'head_2', 0: 'sig_1', 1: 'sig_2',
        },
        loss=[SegmentationDice2D(), SegmentationJaccard2D()])
    Xm = [rs2.rand(1, 5, 5, 1), rs2.rand(1, 5, 5, 1)]
    ym = [(rs2.rand(1, 5, 5, 1) > 0.5).astype(np.float64),
          (rs2.rand(1, 5, 5, 1) > 0.5).astype(np.float64)]
    time_it('Multi-IO DAG', lambda: check_model_gradient(dag, Xm, ym))

    print(f'\nPassed: {passed}, Failed: {failed}')
    return failed == 0


if __name__ == '__main__':
    main()
