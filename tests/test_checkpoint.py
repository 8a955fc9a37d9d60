"""Checkpoint extensions: atomic weight save, optimizer-state roundtrip."""

import json

import numpy as np
import pytest

from univer_ocr_tpu.models import make_monochrome
from univer_ocr_tpu.nn import checkpoint
from univer_ocr_tpu.nn.optimizers import Adam


def test_save_load_weights_atomic(tmp_path):
    path = tmp_path / 'model_weights.json'
    model = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    checkpoint.save_weights({'Monochrome': model}, path)
    assert path.exists()
    blob = json.load(open(path))
    assert 'Monochrome/conv_1' in blob

    model2 = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    assert checkpoint.load_weights({'Monochrome': model2}, path)
    np.testing.assert_allclose(
        np.asarray(model2.layers['Monochrome/conv_1'].params['w']),
        np.asarray(model.layers['Monochrome/conv_1'].params['w']), rtol=1e-6)


def test_optimizer_state_roundtrip(tmp_path):
    path = tmp_path / 'model_weights.json'
    rs = np.random.RandomState(0)
    X = rs.rand(1, 32, 32, 1)
    y = (X > 0.5).astype(np.float64)

    model = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    model.train(X, y)                       # creates opt state
    assert checkpoint.save_optimizer_state({'Monochrome': model}, path)

    model2 = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    model2.train(X, y)                      # build structure
    assert checkpoint.load_optimizer_state({'Monochrome': model2}, path)

    s1 = model.opt_state
    s2 = model2.opt_state
    for ln in s1:
        for pn in s1[ln]:
            for k in s1[ln][pn]:
                np.testing.assert_allclose(np.asarray(s2[ln][pn][k]),
                                           np.asarray(s1[ln][pn][k]),
                                           rtol=1e-6)


def test_load_missing_returns_false(tmp_path):
    model = make_monochrome((1, 32, 32, 1), Adam(lr=1e-3))
    assert not checkpoint.load_weights(
        {'Monochrome': model}, tmp_path / 'nope.json')
    assert not checkpoint.load_optimizer_state(
        {'Monochrome': model}, tmp_path / 'nope.json')
