"""End-to-end evaluation + the save-time eval gate (models/evaluation.py)
and its wiring into both trainers: stage-local validation loss is proven
non-predictive of shipped OCR quality (BASELINE.md rounds 3-4), so a
regressing stage must not be able to replace the committed checkpoint."""

import json

import numpy as np
import pytest

from univer_ocr_tpu.models.evaluation import (line_matched_similarity,
                                              make_eval_gate,
                                              score_results)


class FakeModel:
    def __init__(self, weights):
        self._w = weights

    def get_weights(self):
        return self._w


def test_eval_gate_reject_keeps_approve_ratchets(tmp_path):
    path = tmp_path / 'w.json'
    json.dump({'a': [1]}, open(path, 'w'))
    scores = iter([0.5,   # incumbent (checkpoint on first use)
                   0.4,   # candidate 1: regression -> reject
                   0.6,   # candidate 2: improvement -> approve
                   0.55])  # candidate 3: below the RATCHETED incumbent
    gate = make_eval_gate(str(path), score_fn=lambda w: next(scores),
                          log=lambda *a: None)
    ok, score, incumbent = gate({'m': FakeModel({'b': [2]})})
    assert (ok, score, incumbent) == (False, 0.4, 0.5)
    ok, score, incumbent = gate({'m': FakeModel({'b': [3]})})
    assert (ok, score, incumbent) == (True, 0.6, 0.6)
    # the incumbent advanced on approval: a later stage cannot ratchet
    # quality back down to the original checkpoint level
    ok, score, incumbent = gate({'m': FakeModel({'b': [4]})})
    assert (ok, score, incumbent) == (False, 0.55, 0.6)


def test_eval_gate_scores_checkpoint_overlaid_with_candidates(tmp_path):
    path = tmp_path / 'w.json'
    json.dump({'keep': [1], 'replace': [2]}, open(path, 'w'))
    seen = []

    def score(weights):
        seen.append(dict(weights))
        return 1.0

    gate = make_eval_gate(str(path), score_fn=score, log=lambda *a: None)
    gate({'m': FakeModel({'replace': [9], 'new': [3]})})
    assert seen[0] == {'keep': [1], 'replace': [2]}          # incumbent
    assert seen[1] == {'keep': [1], 'replace': [9], 'new': [3]}


def test_eval_gate_margin_allows_small_regression(tmp_path):
    path = tmp_path / 'w.json'
    json.dump({'a': [1]}, open(path, 'w'))
    scores = iter([0.50, 0.49])
    gate = make_eval_gate(str(path), score_fn=lambda w: next(scores),
                          margin=0.02, log=lambda *a: None)
    ok, _, incumbent = gate({'m': FakeModel({})})
    assert ok
    assert incumbent == 0.50          # max() keeps the higher incumbent


def test_score_results_exact_and_degenerate():
    truths = [{'0_0': 'hello', '1_0': 'world'}]
    perfect = score_results(truths, [[['hello'], ['world']]])
    assert perfect['concat'] == 1.0
    assert perfect['matched'] == pytest.approx(1.0)
    assert perfect['exact_lines'] == 2 and perfect['total_lines'] == 2
    empty = score_results(truths, [[]])
    assert empty['concat'] < 0.1 and empty['exact_lines'] == 0


def test_line_matched_similarity_order_independent():
    true_lines = ['alpha beta', 'gamma delta']
    assert line_matched_similarity(true_lines,
                                   ['gamma delta', 'alpha beta']) == \
        pytest.approx(1.0)
    # hallucinated extra line dilutes the denominator
    diluted = line_matched_similarity(true_lines,
                                      ['gamma delta', 'alpha beta', 'junk'])
    assert 0.5 < diluted < 1.0


def test_canonical_maps_similar_pairs():
    from univer_ocr_tpu.models.evaluation import canonical
    from univer_ocr_tpu.primitives import SIMILAR_CHARS_PAIRS_LIST
    ru, en = SIMILAR_CHARS_PAIRS_LIST[0]
    assert canonical(ru) == canonical(en)


# ---------------------------------------------------------------------------
# Trainer integration: the gate controls checkpoint overwrites
# ---------------------------------------------------------------------------


def test_batched_stage_gate_blocks_checkpoint(tmp_path):
    from univer_ocr_tpu.models.dp_train import train_stage_batched
    from univer_ocr_tpu.models.model import Modes

    rs = np.random.RandomState(0)
    samples = [(rs.rand(1, 40, 100, 1).astype(np.float32),
                (rs.rand(1, 40, 100, 2) > 0.7).astype(np.float32))
               for _ in range(4)]
    path = tmp_path / 'w.json'
    json.dump({'sentinel': [1]}, open(path, 'w'))

    calls = []

    def rejecting_gate(models):
        calls.append(sorted(models))
        return False, 0.1, 0.5

    train_stage_batched(Modes.TRAIN_LINE, samples, samples[:1], {},
                        epochs=1, lr=1e-3, lr_step=0.995, batch=4,
                        input_shape=(1, 256, 320, 1),
                        checkpoint_path=str(path),
                        eval_gate=rejecting_gate, log=lambda *a: None)
    assert calls == [['Line']]
    assert json.load(open(path)) == {'sentinel': [1]}   # kept verbatim

    train_stage_batched(Modes.TRAIN_LINE, samples, samples[:1], {},
                        epochs=1, lr=1e-3, lr_step=0.995, batch=4,
                        input_shape=(1, 256, 320, 1),
                        checkpoint_path=str(path),
                        eval_gate=lambda m: (True, 0.9, 0.5),
                        log=lambda *a: None)
    written = json.load(open(path))
    assert 'sentinel' in written            # merge-saving writer
    assert any(k.startswith('Line') for k in written)


def test_per_sample_trainer_gate_blocks_save(tmp_path):
    from test_trainer import StubDataset, make_setup
    from univer_ocr_tpu.models.trainer import Trainer
    from univer_ocr_tpu.nn.progress_tracker import BaseProgressTracker

    system, models, optimizer, context_fn = make_setup()
    saved = []
    trainer = Trainer(
        system, context_fn, models, StubDataset(2), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=optimizer,
        save_weights_func=lambda names: saved.append(list(names)),
        eval_gate=lambda m: (False, 0.1, 0.5))
    trainer.train(num_epochs=1)
    assert saved == []                      # gate rejected the only save

    system, models, optimizer, context_fn = make_setup()
    trainer = Trainer(
        system, context_fn, models, StubDataset(2), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=optimizer,
        save_weights_func=lambda names: saved.append(list(names)),
        eval_gate=lambda m: (True, 0.9, 0.5))
    trainer.train(num_epochs=1)
    assert saved                            # gate approved


# ---------------------------------------------------------------------------
# Predicted-crop sample builder: serving distribution in, GT labels out
# ---------------------------------------------------------------------------


@pytest.fixture(scope='module')
def checkpoint_weights():
    from univer_ocr_tpu.models.constants import MODEL_WEIGHTS_FILE_PATH
    return json.load(open(MODEL_WEIGHTS_FILE_PATH))


def test_collect_stage_samples_predicted(checkpoint_weights):
    import random

    from univer_ocr_tpu.models.datasets import GeneratorDataset
    from univer_ocr_tpu.models.dp_train import (
        collect_stage_samples_predicted)
    from univer_ocr_tpu.models.model import Modes

    random.seed(11)
    np.random.seed(11)
    ds = GeneratorDataset(2, 416, 272)
    shape = (1, 288, 432, 1)

    line = collect_stage_samples_predicted(
        Modes.TRAIN_LINE, ds, checkpoint_weights, input_shape=shape,
        chunk=2, log=lambda *a: None)
    assert line, 'no predicted paragraph crops on generated pages'
    for x, y in line:
        assert x.ndim == 4 and x.shape[:1] == (1,) and x.shape[3] == 1
        assert y.shape == x.shape[:3] + (2,)     # GT bands, same frame
        assert 0.0 <= x.min() and x.max() <= 1.0
    assert any(y.max() == 1.0 for _, y in line)  # real GT content

    char = collect_stage_samples_predicted(
        Modes.TRAIN_CHAR, ds, checkpoint_weights, input_shape=shape,
        chunk=2, log=lambda *a: None)
    assert char, 'no predicted line crops'
    for x, y in char:
        assert x.shape[1] == 32 and x.shape[3] == 1
        assert y.shape == (x.shape[2], 162)      # per-column one-hot
        assert y.sum(axis=1).max() <= 1.0 + 1e-6
    assert any(y.sum() > 0 for _, y in char)
