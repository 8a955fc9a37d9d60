"""Model container behavior: unravel naming, shape inference, weights IO,
optimizer steps, NaN handling, receptive fields (reference models.py)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from univer_ocr_tpu import nn

RS = np.random.RandomState


def small_seg_model(optimizer=None, loss=None):
    opt = optimizer or nn.Adam(lr=1e-2)
    return nn.Sequential([
        nn.Convolutional2D((3, 3), out_channels=4, padding=1, optimizer=opt),
        nn.LeakyRelu(0.01),
        nn.Convolutional2D((3, 3), out_channels=1, padding=1, optimizer=opt),
        nn.Sigmoid(),
    ], loss=loss or nn.SegmentationDice2D())


def test_sequential_layer_naming():
    model = small_seg_model()
    assert list(model.layers.keys()) == [
        '0_Convolutional2D', '1_LeakyRelu', '2_Convolutional2D', '3_Sigmoid']


def test_nested_unravel_names_match_checkpoint_schema():
    """Names like 'Paragraph/down_1/conv_1' are the checkpoint namespace
    (reference models.py:109-158 + model.py:42-87 factories)."""
    def conv_block():
        return nn.Model(
            layers={'conv_1': nn.Convolutional2D((3, 3), out_channels=2, padding=1),
                    'act_1': nn.LeakyRelu(0.01)},
            relations={'conv_1': 0, 'act_1': 'conv_1', 0: 'act_1'})

    outer = nn.Model(
        layers={'down_1': conv_block(), 'end': conv_block()},
        relations={'down_1': 0, 'end': 'down_1', 0: 'end'})
    wrapped = nn.Model(layers={'Paragraph': outer},
                       relations={'Paragraph': 0, 0: 'Paragraph'})
    assert set(wrapped.layers.keys()) == {
        'Paragraph/down_1/conv_1', 'Paragraph/down_1/act_1',
        'Paragraph/end/conv_1', 'Paragraph/end/act_1'}


def test_shape_inference_and_output_shapes():
    model = small_seg_model()
    model.initialize((1, 16, 16, 1))
    shapes, all_shapes = model.get_all_output_shapes([(1, 16, 16, 1)])
    assert shapes == [(1, 16, 16, 1)]
    assert all_shapes['0_Convolutional2D'] == [(1, 16, 16, 4)]


def test_cycle_detection():
    model = nn.Model(
        layers={'a': nn.Relu(), 'b': nn.Concat(), 'c': nn.Relu()},
        relations={'a': 0, 'b': ['a', 'c'], 'c': 'b', 0: 'c'})
    with pytest.raises(RecursionError):
        model.initialize((1, 4, 4, 1))


def test_weights_roundtrip_through_json():
    model = small_seg_model()
    model.initialize((1, 8, 8, 1))
    weights = model.get_weights()
    blob = json.dumps(weights)           # must be JSON-serializable
    weights2 = json.loads(blob)

    model2 = small_seg_model()
    model2.initialize((1, 8, 8, 1))
    model2.set_weights(weights2)
    for name in weights:
        for pname in weights[name]:
            np.testing.assert_allclose(
                np.asarray(model2.layers[name].params[pname]),
                np.asarray(model.layers[name].params[pname]), rtol=1e-6)


def test_set_weights_skips_nan_and_shape_mismatch(capsys):
    model = small_seg_model()
    model.initialize((1, 8, 8, 1))
    orig = np.asarray(model.layers['0_Convolutional2D'].params['w']).copy()
    bad = {
        '0_Convolutional2D': {
            'w': (np.full((3, 3, 1, 4), np.nan)).tolist(),   # NaN -> skip
            'b': np.zeros((7,)).tolist(),                    # wrong shape -> skip
        }
    }
    model.set_weights(bad)
    out = capsys.readouterr().out
    assert 'NaN found' in out and 'Shapes don`t match' in out
    np.testing.assert_array_equal(
        np.asarray(model.layers['0_Convolutional2D'].params['w']), orig)


def test_nan_weights_scan():
    model = small_seg_model()
    model.initialize((1, 8, 8, 1))
    assert not model.nan_weights()
    p = model.layers['0_Convolutional2D'].params
    p['w'] = p['w'].at[0, 0, 0, 0].set(jnp.nan)
    assert model.nan_weights()


def test_count_parameters():
    model = small_seg_model()
    model.initialize((1, 8, 8, 1))
    # conv1: 3*3*1*4 + 4 = 40; conv2: 3*3*4*1 + 1 = 37
    assert model.count_parameters() == 77


def test_train_decreases_loss():
    model = small_seg_model(optimizer=nn.Adam(lr=3e-3))
    X = RS(0).rand(1, 8, 8, 1)
    y = (X > 0.5).astype(np.float64)
    model.initialize((1, 8, 8, 1))
    first = model.train(X, y)['output_losses'][0]
    for _ in range(30):
        last = model.train(X, y)['output_losses'][0]
    assert last < first


def test_train_and_test_agree_on_losses():
    model = small_seg_model()
    X = RS(1).rand(1, 8, 8, 1)
    y = (X > 0.5).astype(np.float64)
    model.initialize((1, 8, 8, 1))
    test_loss = model.test(X, y)['output_losses'][0]
    train_loss = model.train(X, y)['output_losses'][0]  # pre-update loss
    assert np.isclose(test_loss, train_loss, rtol=1e-6)


def test_non_trainable_layer_frozen():
    opt = nn.Adam(lr=1e-2)
    frozen_conv = nn.Convolutional2D((3, 3), out_channels=4, padding=1,
                                     optimizer=opt, trainable=False)
    model = nn.Sequential([
        frozen_conv,
        nn.Convolutional2D((3, 3), out_channels=1, padding=1, optimizer=opt),
        nn.Sigmoid(),
    ], loss=nn.SegmentationDice2D())
    model.initialize((1, 8, 8, 1))
    w_before = np.asarray(frozen_conv.params['w']).copy()
    X = RS(2).rand(1, 8, 8, 1)
    y = (X > 0.5).astype(np.float64)
    model.train(X, y)
    np.testing.assert_array_equal(np.asarray(frozen_conv.params['w']), w_before)


@pytest.mark.parametrize('opt_cls,kwargs', [
    (nn.Adam, {}), (nn.Momentum, {'momentum': 0.9}),
    (nn.RMSProp, {}), (nn.Adagrad, {}),
])
def test_optimizer_reference_math(opt_cls, kwargs):
    """Single-step update equals the reference's formulas
    (optimizers.py:31-98) computed in NumPy."""
    opt = opt_cls(lr=0.1, **kwargs) if 'lr' not in kwargs else opt_cls(**kwargs)
    p = jnp.asarray(RS(3).randn(4, 3))
    g = jnp.asarray(RS(4).randn(4, 3))
    state = opt.init_leaf_state(p)
    new_p, _ = opt.leaf_update(p, g, state, 0.1)
    pn, gn = np.asarray(p), np.asarray(g)
    eps = 1e-8
    if opt_cls is nn.Adam:
        vel = 0.1 * gn
        acc = 0.001 * gn ** 2
        expected = pn - 0.1 / (np.sqrt(acc) + eps) * vel
    elif opt_cls is nn.Momentum:
        expected = pn - 0.1 * gn
    elif opt_cls is nn.RMSProp:
        acc = 0.01 * gn ** 2
        expected = pn - 0.1 / (np.sqrt(acc) + eps) * gn
    else:  # Adagrad
        acc = gn ** 2
        expected = pn - 0.1 / (np.sqrt(acc) + eps) * gn
    np.testing.assert_allclose(np.asarray(new_p), expected, rtol=1e-7)


def test_receptive_fields_conv_chain():
    model = nn.Sequential([
        nn.Convolutional2D((3, 3), out_channels=2, padding=1),
        nn.Relu(),
        nn.Convolutional2D((5, 5), out_channels=1, padding=2),
    ], loss=nn.SegmentationDice2D())
    model.initialize((1, 16, 16, 1))
    rf = model.get_receptive_fields()
    # Last conv sees 5x5 of the first conv's output; chained with the first
    # 3x3 conv the model output at (0,0) sees rows -3..3 (7 wide).
    last = rf['2_Convolutional2D']['input 0']
    assert last['cnt'] == (7, 7)
    assert last['y'] == (-3, 3)
    assert last['is_solid_y'] and last['is_solid_x']


def test_model_system_pipeline():
    """ModelSystem chains components over a shared context
    (reference model_system.py:148-167)."""
    model = small_seg_model()
    model.initialize((1, 8, 8, 1))

    def double_X(context):
        context['X2'] = context['X']

    system = nn.ModelSystem([
        nn.RawFunctionComponent(double_X),
        nn.ModelComponent('Seg', model,
                          nn.StringSelector('X2', 'y', 'pred'),
                          delist_result=True),
    ])
    X = RS(5).rand(1, 8, 8, 1)
    y = (X > 0.5).astype(np.float64)
    context = {'X': X, 'y': y}
    system.train(context)
    assert 'Seg' in context['losses']
    assert context['pred'].shape == (1, 8, 8, 1)
    context = {'X': X, 'y': y}
    system.test(context)
    assert 'Seg' in context['losses']
    context = {'X': X}
    system.predict(context)
    assert 'Seg' in context['prediction']
