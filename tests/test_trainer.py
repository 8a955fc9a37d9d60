"""Trainer behavior: loss bookkeeping, NaN rollback, best-weight saving
(reference trainer.py:128-296)."""

import numpy as np
import pytest

import jax.numpy as jnp

from univer_ocr_tpu.models import Modes, make_context_maker, make_model_system
from univer_ocr_tpu.models.trainer import Losses, Trainer
from univer_ocr_tpu.nn.optimizers import Adam
from univer_ocr_tpu.nn.progress_tracker import BaseProgressTracker

PAGE = (1, 32, 32, 1)


class StubDataset:
    def __init__(self, n=2, seed=0):
        rs = np.random.RandomState(seed)
        self.pages = [{
            'image': rs.rand(*PAGE).astype(np.float32),
            'monochrome': (rs.rand(*PAGE) > 0.5).astype(np.float32),
        } for _ in range(n)]

    def __len__(self):
        return len(self.pages)

    def get(self, idx, layer_tags=None):
        return {t: self.pages[idx][t] for t in layer_tags}


def make_setup(lr=1e-3):
    optimizer = Adam(lr=lr)
    system, models, _ = make_model_system(
        PAGE, optimizer, mode=Modes.TRAIN_MONOCHROME)
    context_fn = make_context_maker(Modes.TRAIN_MONOCHROME)
    return system, models, optimizer, context_fn


def test_trainer_epoch_runs_and_saves_best():
    system, models, optimizer, context_fn = make_setup()
    saved = []
    trainer = Trainer(
        system, context_fn, models, StubDataset(2), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=optimizer,
        save_weights_func=lambda names: saved.append(list(names)))
    best_losses, best_epochs = trainer.train(num_epochs=2)
    assert 'Monochrome' in best_losses
    assert np.isfinite(best_losses['Monochrome'][0])
    assert saved  # first epoch always improves over inf


def test_trainer_lr_decay():
    system, models, optimizer, context_fn = make_setup(lr=1e-3)
    trainer = Trainer(
        system, context_fn, models, StubDataset(1), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=optimizer,
        learning_rate_step=0.5)
    trainer.train(num_epochs=2)
    # lr *= step**attempts each epoch (reference trainer.py:258-260)
    assert optimizer.lr < 1e-3


def test_trainer_nan_rollback(capsys):
    """NaN weights after an epoch -> reload last weights and redo the epoch
    (reference trainer.py:262-272)."""
    system, models, optimizer, context_fn = make_setup()
    model = models['Monochrome']

    calls = {'n': 0}
    real_nan_weights = model.nan_weights

    def fake_nan_weights():
        calls['n'] += 1
        return calls['n'] == 1       # NaN on first epoch check only

    model.nan_weights = fake_nan_weights
    trainer = Trainer(
        system, context_fn, models, StubDataset(1), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=optimizer)
    trainer.train(num_epochs=1)
    out = capsys.readouterr().out
    assert 'NaN value found in weights, loading last weights' in out
    assert not real_nan_weights()    # rollback restored clean weights


def test_trainer_nan_without_optimizer_raises():
    system, models, optimizer, context_fn = make_setup()
    models['Monochrome'].nan_weights = lambda: True
    trainer = Trainer(
        system, context_fn, models, StubDataset(1), StubDataset(1, seed=1),
        progress_tracker=BaseProgressTracker(), optimizer=None)
    with pytest.raises(ValueError, match='NaN value found'):
        trainer.train(num_epochs=1)


def test_losses_bookkeeping():
    losses = Losses(['M'], {'M': 1})
    losses.reset()
    losses.train({'M': {'output_losses': [2.0]}})
    losses.train({'M': {'output_losses': [4.0]}})
    losses.validation({'M': {'output_losses': [3.0]}})
    losses.normalize(2, 1)
    assert losses.train_losses['M'][0] == 3.0
    assert losses.val_losses['M'][0] == 3.0
    better = losses.get_better_weights(epoch=1)
    assert better == ['M']
    assert losses.best_loss_epoch['M'] == 1


def test_losses_accumulate_multi_crop_contexts():
    """Components that iterate paragraph crops tally one loss entry per
    crop; Losses must read only the first outputs_cnt entries (reference
    trainer.py:47-57) instead of crashing on the longer list."""
    from univer_ocr_tpu.models.trainer import Losses
    losses = Losses(['Line'], {'Line': 1})
    losses.reset()
    losses.validation({'Line': {'output_losses': [0.5] * 11}})
    losses.train({'Line': {'output_losses': [0.25] * 3}})
    assert losses.val_losses['Line'].tolist() == [0.5]
    assert losses.train_losses['Line'].tolist() == [0.25]
