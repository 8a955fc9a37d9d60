"""Curriculum training entry (reference my_model/train.py).

Same 5-stage curriculum (MONOCHROME -> PARAGRAPH -> LINE -> CHAR -> ALL,
same lr/step/epoch table, :100-106), incremental model_weights.json
merging, train-progress PNG dumps, and the message/info/progress_tracker
emitter protocol to the web dashboard."""

import json
from pprint import pprint

import numpy as np
from PIL import Image

import jax

from ..nn.backend import DB
from ..utils.cache import enable_persistent_cache
from ..nn.optimizers import Adam
from ..nn.progress_tracker import ProgressTracker
from .constants import MODEL_WEIGHTS_FILE_PATH, TRAIN_PROGRESS_PATH
from .datasets import (RandomSelectDataset, decode_X, decode_y,
                       train_dataset, validation_dataset)
from .model import Modes, make_context_maker, make_model_system
from .trainer import Trainer

class TrainReporter:
    """Telemetry fan-out for a training run.

    With no sink connected everything falls back to the console; once a
    Socket.IO-style client is connected (`init_emitter`, called by the
    root train.py when launched from the web dashboard) the same payloads
    go out as `message` / `info` / `progress_tracker` events — the event
    vocabulary the dashboard's JS listens for (reference train.py:17-64).
    """

    #: tracker events folded into one dashboard table-update type
    _TIMING_EVENTS = frozenset(('forward', 'backward'))

    def __init__(self, sink=None):
        self._sink = sink

    def connect(self, sink):
        self._sink = sink

    def _send(self, event, payload):
        if self._sink is not None:
            self._sink.emit(event, payload)
            return True
        return False

    def message(self, *parts, sep=' ', end='\n'):
        text = sep.join(str(part) for part in parts) + end
        if not self._send('message', text):
            print(text)

    def info(self, info):
        if self._send('info', info):
            return
        for info_type, info_data in info.items():
            print(f'{info_type}:')
            pprint(info_data, indent=4)
            print()

    @staticmethod
    def _fold_timings(summary):
        """ProgressTracker summary -> {layer: {event: {counter, done,
        time}}} rows for the dashboard's per-layer table."""
        table = {}
        for layer, events in summary.items():
            table[layer] = {
                entry['name']: {'counter': entry['counter'],
                                'done': entry['done'],
                                'time': str(entry['time'])}
                for entry in events}
        return table

    def status(self, status_type, status_data=None):
        if status_type in self._TIMING_EVENTS:
            status_type = 'forward_backward'
            status_data = self._fold_timings(status_data)
        payload = {'type': status_type}
        if status_data is not None:
            payload['data'] = status_data
        self._send('progress_tracker', payload)


_reporter = TrainReporter()

#: kept for callers that inspect the module-level emitter
emitter = None


def init_emitter(new_emitter):
    global emitter
    emitter = new_emitter
    _reporter.connect(new_emitter)


def message(*parts, sep=' ', end='\n'):
    _reporter.message(*parts, sep=sep, end=end)


def emit_info(info):
    _reporter.info(info)


def emit_status(status_type, status_data=None):
    _reporter.status(status_type, status_data)


#: The reference's curriculum table (my_model/train.py:100-106).
CURRICULUM = [
    (Modes.TRAIN_MONOCHROME, 0.0015, 0.995, 100),
    (Modes.TRAIN_PARAGRAPH, 0.0015, 0.995, 100),
    (Modes.TRAIN_LINE, 0.0015, 0.995, 100),
    (Modes.TRAIN_CHAR, 0.0015, 0.9, 10),
    (Modes.TRAIN_ALL, 0.001, 0.9, 10),
]


def train_model(use_gpu=False, show_progress_bar=False,
                save_train_progress=False, curriculum=None,
                train_size=50, val_size=5, batched=False, mesh=None,
                batch=16, predicted=False, eval_gate=False):
    """Run the staged curriculum (reference train.py:67-289).

    `use_gpu` keeps the reference CLI surface: truthy selects the
    accelerator (TPU here), falsy pins host CPU.

    `batched=True` routes the four single-model stages through the
    batched/data-parallel trainer (models/dp_train.py): samples
    materialized once, weighted fixed-shape batches, per-sample-exact
    losses, optional `mesh` sharding over the 'data' axis.  TRAIN_ALL
    (the joint adaptation stage) always runs the per-sample ModelSystem
    path — its inputs are the evolving upstream predictions.

    `predicted=True` materializes the batched Line/Char stages from the
    SERVING crop distribution (predicted masks in, GT labels through the
    same plans — dp_train.collect_stage_samples_predicted).  `eval_gate=
    True` gates every checkpoint overwrite on end-to-end decoded-text
    accuracy (evaluation.make_eval_gate): stage-local validation loss is
    proven non-predictive of shipped OCR quality (BASELINE.md rounds
    3-4).
    """
    enable_persistent_cache()
    if use_gpu:
        DB.use_tpu()
        dev = jax.devices()[0]
        print(f'Using accelerator: {dev.device_kind} ({dev.platform})')
    else:
        DB.use_cpu()
        print('Using CPU')

    tracker = ProgressTracker(emit_status)
    tracker.reset()

    model_weights_file = MODEL_WEIGHTS_FILE_PATH
    train_progress_path = TRAIN_PROGRESS_PATH

    gate = None
    if eval_gate:
        from .evaluation import make_eval_gate
        gate = make_eval_gate(model_weights_file, log=message)

    modes = CURRICULUM if curriculum is None else curriculum

    if batched:
        from .dp_train import _STAGE_MODEL, train_model_batched
        fast = [stage for stage in modes if stage[0] in _STAGE_MODEL]
        if fast:
            train_model_batched(fast, use_gpu=use_gpu, batch=batch,
                                mesh=mesh, train_size=train_size,
                                val_size=val_size, log=message,
                                checkpoint_path=model_weights_file,
                                predicted=predicted, eval_gate=gate)
        modes = [stage for stage in modes if stage[0] not in _STAGE_MODEL]

    for mode, lr, lr_step, epochs in modes:
        print(f'Training mode: {mode.name}')

        # dashboard step badge: dataset (re)build phase (the reference
        # fires 'generating_data' before its epoch loop,
        # templates/train.html:199-203)
        emit_status('generating_data')
        random_train_dataset = RandomSelectDataset(train_size, train_dataset())
        random_validation_dataset = RandomSelectDataset(
            val_size, validation_dataset())

        layers = random_train_dataset.get(0)
        X = layers['image']
        ys = [layers[name] for name in layers.keys() if name != 'image']
        input_shape, output_shapes = X.shape, [y.shape for y in ys]
        message(f'Input shape: {input_shape}, output shapes: {output_shapes}')
        del layers, X, ys

        try:
            weights = json.load(open(model_weights_file, 'r'))
        except OSError:
            print('No model_weights.json file found')
            weights = {}

        optimizer = Adam(lr=lr)
        model_system, models, names = make_model_system(
            input_shape, optimizer, tracker, weights, mode=mode)
        make_context_func = make_context_maker(mode)

        def update_weights_func(models_to_update):
            # atomic merge-save (write-temp + rename): concurrent readers
            # (the web /ocr endpoint, predict) never see a torn file
            from ..nn.checkpoint import save_weights
            save_weights({name: model for name, model in models.items()
                          if name in models_to_update}, model_weights_file)

        if save_train_progress:
            save_pictures_func = _make_save_pictures_func(mode)
            print(f'Saving train progress into {train_progress_path}\n')
        else:
            save_pictures_func = None

        layer_names = names + [
            layer_name
            for model in models.values()
            for layer_name in model.get_leaf_layers().keys()
        ]

        output_shapes = {}
        for model_name, model in models.items():
            tmp_output_shapes = model.get_all_output_shapes(model.input_shapes)
            tmp_output_shapes = {
                model_name: tmp_output_shapes[0],
                **{name: shapes for name, shapes in tmp_output_shapes[1].items()},
            }
            for layer_name, out_shapes in tmp_output_shapes.items():
                output_shapes[layer_name] = [str(x) for x in out_shapes]

        receptive_fields = {}
        for model in models.values():
            if not model.is_fully_convolutional():
                continue
            tmp_receptive_fields = model.get_receptive_fields()
            for layer_name, rf in tmp_receptive_fields.items():
                y, x = rf['input 0']['y'], rf['input 0']['x']
                cnt = rf['input 0']['cnt']
                receptive_fields[layer_name] = f'y={y}, x={x}, size={cnt}'

        emit_info({
            'layer_names': layer_names,
            'output_shapes': output_shapes,
            'receptive_fields': receptive_fields,
        })

        count_parameters = sum(
            model.count_parameters() for model in models.values())
        message(f'Count of parameters: {count_parameters}')

        trainer = Trainer(
            model_system, make_context_func,
            models, random_train_dataset, random_validation_dataset,
            progress_tracker=tracker, show_progress_bar=show_progress_bar,
            optimizer=optimizer, learning_rate_step=lr_step,
            save_weights_func=update_weights_func,
            save_pictures_func=save_pictures_func,
            eval_gate=gate)

        best_loss, best_loss_epoch = trainer.train(num_epochs=epochs)
        message(f'Complete. Best loss was {best_loss} '
                f'on epoch #{best_loss_epoch}')


class ProgressSnapshots:
    """Per-iteration X / y / pred / threshold PNG dumps.

    Writes under train_progress/<mode>/<stage>/ with the reference's file
    naming (train.py:143-241) — single_iteration_from_train_progress.py
    globs these names, so they are an interface.  Restructured as a class
    with one saver per cascade stage, dispatched from the mode table; the
    Char panel assembly is vectorized (the reference argmaxes per batch
    row in a Python loop).
    """

    def __init__(self, mode):
        self.mode = mode
        #: which stage savers run for which training mode
        self._stages = {
            Modes.TRAIN_MONOCHROME: (self._monochrome,),
            Modes.TRAIN_PARAGRAPH: (self._paragraph,),
            Modes.TRAIN_LINE: (self._line,),
            Modes.TRAIN_CHAR: (self._char,),
            Modes.TRAIN_ALL: (self._monochrome, self._paragraph,
                              self._line, self._char),
        }

    def __call__(self, epoch, phase, index, context):
        self._prefix = f'{epoch}_{phase}_{index}_'
        for saver in self._stages.get(self.mode, ()):
            saver(context)

    # -- plumbing --------------------------------------------------------

    def _dir(self, stage):
        path = TRAIN_PROGRESS_PATH / self.mode.name.lower() / stage
        path.mkdir(parents=True, exist_ok=True)
        return path

    @staticmethod
    def _ids(paragraph_id, line_id):
        return ((''if paragraph_id is None else f'{paragraph_id}_')
                + ('' if line_id is None else f'{line_id}_'))

    def _save_quad(self, stage, X, y, pred, th,
                   paragraph_id=None, line_id=None):
        path = self._dir(stage)
        tag = self._prefix + self._ids(paragraph_id, line_id)
        for i, image in enumerate(X):
            image.save(path / f'{tag}1_{i}_1_X.png')
        for i in range(len(y)):
            for suffix, image in (('2_y', y[i]), ('3_pred', pred[i]),
                                  ('4_th', th[i])):
                image.save(path / f'{tag}2_{i}_{suffix}.png')

    def _save_panel(self, stage, array, paragraph_id, line_id):
        path = self._dir(stage)
        tag = self._prefix + self._ids(paragraph_id, line_id)
        Image.fromarray((array * 255).astype(np.uint8)).save(
            path / f'{tag}.png')

    # -- stage savers ----------------------------------------------------

    def _monochrome(self, context):
        self._save_quad('monochrome',
                        [decode_X(context['monochrome_X'])],
                        decode_y(context['monochrome_y'])[0],
                        *decode_y(context['monochrome_pred']))

    def _paragraph(self, context):
        self._save_quad('paragraph',
                        decode_y(context['paragraph_X'])[0],
                        decode_y(context['paragraph_y'])[0],
                        *decode_y(context['paragraph_pred']))

    def _line(self, context):
        per_paragraph = zip(context['cropped_monochrome_cpu'],
                            context['cropped_line_cpu'],
                            context['line_pred'])
        for p_id, (crop, bands, pred) in enumerate(per_paragraph):
            self._save_quad('line',
                            decode_y(crop)[0], decode_y(bands)[0],
                            *decode_y(pred), paragraph_id=p_id)

    def _char(self, context):
        """RGB panel per line: monochrome crop on top, then (pred argmax,
        labels, their overlap) as color channels over (W, classes)."""
        def column(grid):            # (W, C) -> (C, W, 1) image plane
            return np.asarray(grid).T[:, :, None]

        crops = context['cropped_2_monochrome_cpu']
        for p_id, lines in enumerate(crops):
            for l_id in range(len(lines)):
                logits = np.asarray(context['char_pred'][p_id][l_id])
                pred = column(logits == logits.max(axis=1, keepdims=True))
                labels = column(context['char_labels_cpu'][p_id][l_id])
                panel = np.concatenate([pred, labels, pred * labels], axis=2)
                mono_rgb = np.repeat(lines[l_id][0], 3, axis=2)
                self._save_panel('char',
                                 np.concatenate([mono_rgb, panel], axis=0),
                                 p_id, l_id)


def _make_save_pictures_func(mode):
    return ProgressSnapshots(mode)
