"""TRAIN_ALL joint-mode smoke test: the full Monochrome -> Paragraph ->
ParagraphCrop -> Line -> LineCrop -> CharLabel -> Char chain training the
downstream models on PREDICTED upstream inputs (reference train.py's final
curriculum stage) — the mode the round-2/4 adaptation epochs depend on,
previously untested end to end."""

import json
import random

import numpy as np
import pytest

from univer_ocr_tpu.models import (Modes, make_context_maker,
                                   make_model_system)
from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
from univer_ocr_tpu.models.datasets import GeneratorDataset
from univer_ocr_tpu.nn.optimizers import Adam

PAGE_SHAPE = (1, 496, 736, 1)   # 720x480 page after /16 padding


def test_train_all_joint_mode_one_step():
    try:
        weights = json.load(open(MODEL_WEIGHTS_FILE_PATH))
    except OSError:
        pytest.skip('no trained checkpoint available')

    random.seed(7)
    np.random.seed(7)
    layers = GeneratorDataset(1, 720, 480).get(0)

    system, models, names = make_model_system(
        PAGE_SHAPE, Adam(lr=1e-4), weights=weights, mode=Modes.TRAIN_ALL)
    assert names == ['Monochrome', 'Paragraph', 'ParagraphCrop', 'Line',
                     'LineCrop', 'CharLabel', 'Char']

    context = make_context_maker(Modes.TRAIN_ALL)(
        lambda *a, layer_tags=None, **k: {
            t: layers[t] for t in layer_tags})
    system.train(context)

    # every jointly trained model contributed a finite loss (with the
    # trained checkpoint the Paragraph stage detects real paragraphs, so
    # Line and Char actually run on predicted crops)
    for model_name in ('Monochrome', 'Paragraph', 'Line', 'Char'):
        assert model_name in context['losses'], context['losses'].keys()
        for v in context['losses'][model_name]['output_losses']:
            assert np.isfinite(v)

    # predicted-geometry crops flowed through: at least one paragraph
    # was cropped and at least one line reached the Char model
    assert len(context['cropped_monochrome_cpu']) >= 1
    n_lines = sum(len(p) for p in context['char_pred'])
    assert n_lines >= 1
