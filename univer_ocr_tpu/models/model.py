"""Model zoo + cascade assembly (reference my_model/model.py:22-730).

Same architectures and checkpoint namespace:
  * Monochrome: conv_block [16, 1], 3x3, Dice (reference :108-134)
  * Paragraph/Line: 2 stride-2 down conv blocks + 2 upsample blocks +
    sigmoid end, Dice (reference :137-248)
  * Char: conv_block [64,64,64] k(5,3) p(0,1) s(2,1) -> width->batch
    unfold -> flatten -> dense [1024,128,162], SoftmaxCE (reference
    :271-304)
and the same canonical component order Monochrome -> rename -> Paragraph ->
from_device -> ParagraphCrop -> to_device -> Line -> from_device ->
LineCrop -> CharLabel -> to_device -> Char -> from_device -> PredToText
(reference :489-530), with mode-specific subsets.

TPU adaptations: the move components stage host<->HBM via DB; in PREDICT
mode the Line and Char stages run masked, shape-bucketed, batched fastpath
programs (fastpath.py — numerically exact vs the per-shape path) so XLA
compiles O(1) program shapes instead of one per crop size and launches one
program per bucket instead of one per crop/line.
"""

import os
from enum import Enum

import numpy as np

from ..interpreter import (CropAndRotateParagraphs, CropRotateAndZoomLines,
                           LabelChar, PredToText)
from ..nn.backend import DB
from ..nn.help_func import make_list_if_not
from ..nn.layers import (Concat, Conv2DToBatchedFixedWidthed, Convolutional2D,
                         Flatten, FullyConnected, LeakyRelu, Sigmoid,
                         Upsample2D)
from ..nn.losses import SegmentationDice2D, SoftmaxCrossEntropy
from ..nn.model_system import (IterableSelector, ModelComponent, ModelSystem,
                               RawFunctionComponent, StringSelector)
from ..nn.models import Model
from ..nn.optimizers import Adam
from ..nn.progress_tracker import track_function
from ..nn.regularizations import L2
from ..primitives import CHARS
from .bucketing import round_up
from .constants import LAYER_NAMES
from .fastpath import (char_forward_masked, line_forward_masked,
                       make_masked_eval_step, make_masked_train_step,
                       masked_char_loss, masked_line_loss)

CHAR_INPUT_HEIGHT = 32
CHAR_FIXED_WIDTH = 8

#: Width bucket for line crops / height-width bucket for paragraph crops in
#: PREDICT mode (multiples of 16 to satisfy the FCN stride structure).
PARAGRAPH_BUCKET = 64
LINE_WIDTH_BUCKET = 64


def make_divisible_by(arr, y, x):
    """Center-pad an NHWC array so H, W become divisible (reference :26-34).

    Like the reference, always adds at least one row/column of padding.
    """
    b, h, w, c = arr.shape
    to_add_y = y - h % y
    to_add_x = x - w % x
    py, px = to_add_y // 2, to_add_x // 2
    dtype = arr.dtype if np.issubdtype(arr.dtype, np.floating) else np.float64
    new_arr = np.zeros((b, h + to_add_y, w + to_add_x, c), dtype=dtype)
    new_arr[:, py:py + h, px:px + w, :] = arr
    return new_arr


def make_conv(out_ch, kernel_size=(5, 5), padding=2, **kwargs):
    return Convolutional2D(kernel_size, out_channels=out_ch, padding=padding,
                           regularizer=L2(0.01), **kwargs)


def make_conv_block(out_chs, last_sigmoid=False, **kwargs):
    """Chain of conv+LeakyReLU(0.01), optional trailing Sigmoid
    (reference :42-59); layer names conv_i / leaky_relu_i / sigmoid are
    checkpoint keys."""
    out_chs = make_list_if_not(out_chs)
    layers = {}
    relations = {}
    prev = 0
    for i in range(1, len(out_chs) + 1):
        conv_name, conv = f'conv_{i}', make_conv(out_chs[i - 1], **kwargs)
        layers[conv_name] = conv
        if i == len(out_chs) and last_sigmoid is True:
            activation_name, activation = 'sigmoid', Sigmoid()
        else:
            activation_name, activation = f'leaky_relu_{i}', LeakyRelu(0.01)
        layers[activation_name] = activation
        relations[conv_name] = prev
        relations[activation_name] = conv_name
        prev = activation_name
    relations[0] = prev
    return Model(layers, relations)


def make_up(out_chs, **kwargs):
    """Upsample + skip concat + conv block (reference :62-73; unused by the
    cascade but part of the zoo surface)."""
    return Model(layers={
        'upsample': Upsample2D(2),
        'concat': Concat(),
        'conv_block': make_conv_block(out_chs, **kwargs),
    }, relations={
        'upsample': 1,
        'concat': ['upsample', 0],
        'conv_block': 'concat',
        0: 'conv_block',
    })


def make_single_up(out_chs, **kwargs):
    return Model(layers={
        'upsample': Upsample2D(2),
        'conv_block': make_conv_block(out_chs, **kwargs),
    }, relations={
        'upsample': 0,
        'conv_block': 'upsample',
        0: 'conv_block',
    })


def wrap(name, model, **kwargs):
    return Model(layers={name: model}, relations={name: 0, 0: name}, **kwargs)


def make_edge_detection(input_shape):
    """Fixed 3x3 sharpen conv, non-trainable (reference :90-105)."""
    batch_size, height, width, in_channels = input_shape
    w = np.zeros((3, 3, in_channels, in_channels))
    kernel = np.array([
        [0, -1, 0],
        [-1, 5, -1],
        [0, -1, 0],
    ])
    for c in range(in_channels):
        w[:, :, c, c] = kernel
    b = np.zeros((in_channels,))
    conv = Convolutional2D(
        (3, 3), in_channels=in_channels, out_channels=in_channels,
        padding=1, w=w, b=b, trainable=False)

    def func(X):
        return conv.forward(X)[0]

    return func


def make_monochrome(input_shape, optimizer=None):
    optimizer = Adam(lr=1e-2) if optimizer is None else optimizer
    kwargs = {'optimizer': optimizer, 'trainable': True}

    ch_count = [16, len(LAYER_NAMES['monochrome'])]

    model = Model(
        layers={
            'Monochrome': make_conv_block(
                ch_count, last_sigmoid=True,
                kernel_size=(3, 3), padding=1, **kwargs),
        },
        relations={'Monochrome': 0, 0: 'Monochrome'},
        loss=SegmentationDice2D())
    model.initialize(input_shape)
    return model


def _make_updown_fcn(name, width, out_ch, input_shape, optimizer):
    """Shared Paragraph/Line encoder-decoder shape (reference :137-248):
    downs [w],[w] stride-2 k5 p2, single-ups [w],[w], sigmoid end [out]."""
    kwargs = {'optimizer': optimizer, 'trainable': True}
    ch_count_downs = [None, [width], [width]]
    ch_count_ups = [None, [width], [width]]
    ch_count_end = [out_ch]

    layers = {
        **{
            f'down_{i}': make_conv_block(
                ch_count_downs[i],
                kernel_size=(5, 5), padding=2, stride=2, **kwargs)
            for i in range(1, len(ch_count_downs))
        },
        **{
            f'up_{i}': make_single_up(
                ch_count_ups[i],
                kernel_size=(5, 5), padding=2, **kwargs)
            for i in range(1, len(ch_count_ups))
        },
        'end': make_conv_block(
            ch_count_end, last_sigmoid=True,
            kernel_size=(5, 5), padding=2, **kwargs),
    }
    relations = {
        'down_1': 0,
        **{
            f'down_{i + 1}': f'down_{i}'
            for i in range(1, len(ch_count_downs) - 1)
        },
        f'up_{len(ch_count_ups) - 1}': f'down_{len(ch_count_downs) - 1}',
        **{
            f'up_{i}': f'up_{i + 1}'
            for i in range(1, len(ch_count_ups) - 1)
        },
        'end': 'up_1',
        0: 'end',
    }

    model = wrap(name, Model(layers=layers, relations=relations),
                 loss=SegmentationDice2D())
    model.initialize(input_shape)
    return model


def make_paragraph(input_shape, optimizer=None):
    optimizer = Adam(lr=1e-2) if optimizer is None else optimizer
    return _make_updown_fcn('Paragraph', 1, len(LAYER_NAMES['paragraph']),
                            input_shape, optimizer)


def make_line(input_shape, optimizer=None):
    optimizer = Adam(lr=1e-2) if optimizer is None else optimizer
    return _make_updown_fcn('Line', 4, len(LAYER_NAMES['line']),
                            input_shape, optimizer)


def make_dense_block(out_counts, **kwargs):
    out_counts = make_list_if_not(out_counts)
    layers = {}
    relations = {}
    prev = 0
    for i in range(1, len(out_counts) + 1):
        dense_name = f'dense_{i}'
        layers[dense_name] = FullyConnected(n_output=out_counts[i - 1], **kwargs)
        relations[dense_name] = prev
        if i < len(out_counts):
            activation_name = f'leaky_relu_{i}'
            layers[activation_name] = LeakyRelu(0.01)
            relations[activation_name] = dense_name
            prev = activation_name
        else:
            prev = dense_name
    relations[0] = prev
    return Model(layers, relations)


def make_char(input_shape, optimizer=None):
    optimizer = Adam(lr=1e-2) if optimizer is None else optimizer
    kwargs = {'optimizer': optimizer, 'trainable': True}

    batch_size, _, width, in_channels = input_shape
    ch_counts = [64, 64, 64]
    n_counts = [1024, 128, len(CHARS)]

    layers = {
        'conv_block': make_conv_block(
            ch_counts, kernel_size=(5, 3), padding=(0, 1), stride=(2, 1),
            **kwargs),
        'fixed_width': Conv2DToBatchedFixedWidthed(CHAR_FIXED_WIDTH),
        'flatten': Flatten(),
        'dense_block': make_dense_block(n_counts, **kwargs),
    }
    relations = {
        'conv_block': 0,
        'fixed_width': 'conv_block',
        'flatten': 'fixed_width',
        'dense_block': 'flatten',
        0: 'dense_block',
    }

    input_shape = (batch_size, CHAR_INPUT_HEIGHT, width, in_channels)
    model = wrap('Char', Model(layers=layers, relations=relations),
                 loss=SoftmaxCrossEntropy())
    model.initialize(input_shape)
    return model


# ---------------------------------------------------------------------------
# Host<->device staging components (reference :307-350)
# ---------------------------------------------------------------------------

def make_move_from_gpu_component(labels):
    def move_from_gpu(var):
        if isinstance(var, list):
            return [move_from_gpu(v) for v in var]
        if isinstance(var, dict):
            return {k: move_from_gpu(v) for k, v in var.items()}
        return DB.asnumpy(var)

    def func(context):
        for old_label, new_label in labels:
            context[new_label] = move_from_gpu(context[old_label])

    return RawFunctionComponent(func)


def make_move_to_gpu_component(labels):
    def move_to_gpu(var):
        if isinstance(var, list):
            return [move_to_gpu(v) for v in var]
        if isinstance(var, dict):
            return {k: move_to_gpu(v) for k, v in var.items()}
        return DB.copy(var)

    def func(context):
        for old_label, new_label in labels:
            context[new_label] = move_to_gpu(context[old_label])

    return RawFunctionComponent(func)


# Reference-named aliases for the same staging (device == "gpu" there).
make_move_from_device_component = make_move_from_gpu_component
make_move_to_device_component = make_move_to_gpu_component


def get_from_context(context, labels):
    return [context[label] for label in labels]


def put_to_context(context, labels, values):
    for label, value in zip(labels, values):
        context[label] = value


def make_rename_in_context_component(labels):
    def rename_in_context(context):
        for old_label, new_label in labels:
            context[new_label] = context[old_label]
    return RawFunctionComponent(rename_in_context)


# ---------------------------------------------------------------------------
# Nested-list selectors (reference :353-400)
# ---------------------------------------------------------------------------

class LineSelector(IterableSelector):
    """Iterates per-paragraph crops: context[X_label][paragraph_id]."""

    def __init__(self, X_label, y_label, pred_label):
        super().__init__(X_label, y_label, pred_label)
        self.paragraph_id = 0

    def __call__(self, context):
        super().__call__(context)
        self.paragraph_id = 0
        # Pre-create the prediction key so zero-paragraph pages flow through
        # the rest of the pipeline as empty lists instead of KeyErrors.
        context.setdefault(self.pred_label, [])

    def get(self):
        for i in range(len(self.context[self.X_label])):
            self.paragraph_id = i
            yield (self.context[self.X_label][i],
                   self.context[self.y_label][i])

    def get_X(self):
        for i in range(len(self.context[self.X_label])):
            self.paragraph_id = i
            yield self.context[self.X_label][i]

    def put(self, pred):
        if self.pred_label not in self.context.keys():
            self.context[self.pred_label] = []
        if self.paragraph_id >= len(self.context[self.pred_label]):
            self.context[self.pred_label].append([])
        self.context[self.pred_label][self.paragraph_id] = pred


class CharSelector(IterableSelector):
    """Iterates per-paragraph-per-line crops."""

    def __init__(self, X_label, y_label, pred_label):
        super().__init__(X_label, y_label, pred_label)
        self.paragraph_id = 0
        self.line_id = 0

    def __call__(self, context):
        super().__call__(context)
        self.paragraph_id = 0
        self.line_id = 0
        context.setdefault(self.pred_label, [])

    def get(self):
        for i in range(len(self.context[self.X_label])):
            self.paragraph_id = i
            for j in range(len(self.context[self.X_label][i])):
                self.line_id = j
                yield (self.context[self.X_label][i][j],
                       self.context[self.y_label][i][j])

    def get_X(self):
        for i in range(len(self.context[self.X_label])):
            self.paragraph_id = i
            for j in range(len(self.context[self.X_label][i])):
                self.line_id = j
                yield self.context[self.X_label][i][j]

    def put(self, pred):
        if self.pred_label not in self.context.keys():
            self.context[self.pred_label] = []
        if self.paragraph_id >= len(self.context[self.pred_label]):
            self.context[self.pred_label].append([])
        if self.line_id >= len(self.context[self.pred_label][self.paragraph_id]):
            self.context[self.pred_label][self.paragraph_id].append([])
        self.context[self.pred_label][self.paragraph_id][self.line_id] = pred


class FastLineComponent(ModelComponent):
    """Predict-path Line component: bucket paragraph crops to shape
    multiples, batch same-bucket crops together, and run the masked
    fastpath — numerically exact vs the per-shape path (fastpath.py) while
    compiling one XLA program per bucket instead of one per crop shape."""

    def __init__(self, name, model, selector, delist_result=True, bucket=64):
        super().__init__(name, model, selector, delist_result)
        self.bucket = bucket
        import jax
        from functools import partial
        self._fn = jax.jit(partial(line_forward_masked, prefix='Line'))

    def predict(self, context):
        import jax.numpy as jnp
        crops = [np.asarray(c) for c in context[self.selector.X_label]]
        preds = [None] * len(crops)

        groups = {}
        for i, c in enumerate(crops):
            hb = round_up(c.shape[1], self.bucket)
            wb = round_up(c.shape[2], self.bucket)
            groups.setdefault((hb, wb), []).append(i)

        params = self.model.params
        for (hb, wb), idxs in groups.items():
            n = 1 << (len(idxs) - 1).bit_length()   # batch bucket: next pow2
            ch = crops[idxs[0]].shape[3]
            batch = np.zeros((n, hb, wb, ch), np.float32)
            hs = np.full((n,), 4, np.int32)
            ws = np.full((n,), 4, np.int32)
            for bi, i in enumerate(idxs):
                c = crops[i]
                batch[bi, :c.shape[1], :c.shape[2], :] = c[0]
                hs[bi], ws[bi] = c.shape[1], c.shape[2]
            out = np.asarray(self._fn(params, jnp.asarray(batch),
                                      jnp.asarray(hs), jnp.asarray(ws)))
            for bi, i in enumerate(idxs):
                h, w = crops[i].shape[1], crops[i].shape[2]
                preds[i] = out[bi:bi + 1, :h, :w, :]

        context['prediction'][self.name] = preds
        context[self.selector.pred_label] = preds


class FastCharComponent(ModelComponent):
    """Predict-path Char component: gather every line of every paragraph,
    bucket by width, batch each bucket through the masked Char fastpath
    (one program launch per bucket per page instead of one per line)."""

    def __init__(self, name, model, selector, delist_result=True, bucket=64):
        super().__init__(name, model, selector, delist_result)
        self.bucket = bucket
        import jax
        self._fn = jax.jit(char_forward_masked)

    def predict(self, context):
        import jax.numpy as jnp
        nested = context[self.selector.X_label]
        preds = [[None] * len(para) for para in nested]

        flat = []
        for p_id, para in enumerate(nested):
            for l_id, line in enumerate(para):
                flat.append((p_id, l_id, np.asarray(line)))

        groups = {}
        for k, (_, _, line) in enumerate(flat):
            wb = round_up(line.shape[2], self.bucket)
            groups.setdefault(wb, []).append(k)

        params = self.model.params
        for wb, idxs in groups.items():
            n = 1 << (len(idxs) - 1).bit_length()
            ch = flat[idxs[0]][2].shape[3]
            batch = np.zeros((n, CHAR_INPUT_HEIGHT, wb, ch), np.float32)
            ws = np.full((n,), 4, np.int32)
            for bi, k in enumerate(idxs):
                line = flat[k][2]
                batch[bi, :, :line.shape[2], :] = line[0]
                ws[bi] = line.shape[2]
            out = np.asarray(self._fn(params, jnp.asarray(batch),
                                      jnp.asarray(ws)))
            for bi, k in enumerate(idxs):
                p_id, l_id, line = flat[k]
                preds[p_id][l_id] = out[bi, :line.shape[2], :]

        context['prediction'][self.name] = preds
        context[self.selector.pred_label] = preds


class FastLineTrainComponent(ModelComponent):
    """TRAIN-mode Line component: per-crop sequential optimizer updates
    (the reference's training order, so trajectories match), but each crop
    is bucket-padded and trained through the masked step — same loss and
    gradients as the per-shape path (fastpath.py), O(1) compiled programs
    instead of one per crop shape."""

    def __init__(self, name, model, selector, delist_result=True, bucket=128):
        super().__init__(name, model, selector, delist_result)
        self.bucket = bucket
        import jax.numpy as jnp
        from functools import partial
        self._jnp = jnp
        opt = model._optimizer()
        loss_fn = partial(masked_line_loss, prefix=name,
                          reg_fn=model.regularization_fn)
        self._train_step = (make_masked_train_step(opt, loss_fn)
                            if opt is not None else None)
        self._eval_step = make_masked_eval_step(loss_fn)

    def _pad(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        b, h, w, c = X.shape
        hb = round_up(h, self.bucket)
        wb = round_up(w, self.bucket)
        xp = np.zeros((b, hb, wb, c), np.float32)
        xp[:, :h, :w, :] = X
        yp = np.zeros((b, hb, wb, y.shape[3]), np.float32)
        yp[:, :h, :w, :] = y
        return xp, yp, h, w

    def _run(self, X, y, training):
        jnp = self._jnp
        xp, yp, h, w = self._pad(X, y)
        model = self.model
        hj = jnp.asarray(h, jnp.int32)
        wj = jnp.asarray(w, jnp.int32)
        if training:
            opt = model._optimizer()
            params = model.params
            opt_state = model._ensure_opt_state(params)
            new_params, new_opt_state, out_loss, reg, pred = self._train_step(
                params, opt_state, jnp.asarray(opt.lr, jnp.float32),
                jnp.asarray(xp), jnp.asarray(yp), hj, wj)
            model.params = new_params
            model.opt_state = new_opt_state
        else:
            out_loss, reg, pred = self._eval_step(
                model.params, jnp.asarray(xp), jnp.asarray(yp), hj, wj)
        pred = np.asarray(pred)[:, :h, :w, :]
        model.layers_outputs = {0: pred}
        return ({'output_losses': [float(out_loss)],
                 'regularization_loss': float(reg)}, pred)

    def train(self, context):
        self.selector(context)
        for X, y in self.selector.get():
            losses, pred = self._run(X, y, training=True)
            self._tally_losses(context, losses)
            self.selector.put(pred if self.delist_result else [pred])

    def test(self, context):
        self.selector(context)
        for X, y in self.selector.get():
            losses, pred = self._run(X, y, training=False)
            # test() reports output losses only (reference models.py:256-268)
            self._tally_losses(context, {
                'output_losses': losses['output_losses']})
            self.selector.put(pred if self.delist_result else [pred])


class FastCharTrainComponent(ModelComponent):
    """TRAIN-mode Char component: bucketed masked per-line train steps
    (same rationale as FastLineTrainComponent)."""

    def __init__(self, name, model, selector, delist_result=True, bucket=128):
        super().__init__(name, model, selector, delist_result)
        self.bucket = bucket
        import jax.numpy as jnp
        from functools import partial
        self._jnp = jnp
        opt = model._optimizer()
        loss_fn = partial(masked_char_loss, reg_fn=model.regularization_fn)
        self._train_step = (make_masked_train_step(opt, loss_fn)
                            if opt is not None else None)
        self._eval_step = make_masked_eval_step(loss_fn)

    def _pad(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float32)
        b, h, w, c = X.shape
        wb = round_up(w, self.bucket)
        xp = np.zeros((b, h, wb, c), np.float32)
        xp[:, :, :w, :] = X
        yp = np.zeros((wb * b, y.shape[1]), np.float32)
        yp[:y.shape[0], :] = y
        return xp, yp, w

    def _run(self, X, y, training):
        jnp = self._jnp
        xp, yp, w = self._pad(X, y)
        model = self.model
        wj = jnp.asarray(w, jnp.int32)
        if training:
            opt = model._optimizer()
            params = model.params
            opt_state = model._ensure_opt_state(params)
            new_params, new_opt_state, out_loss, reg, pred = self._train_step(
                params, opt_state, jnp.asarray(opt.lr, jnp.float32),
                jnp.asarray(xp), jnp.asarray(yp), wj)
            model.params = new_params
            model.opt_state = new_opt_state
        else:
            out_loss, reg, pred = self._eval_step(
                model.params, jnp.asarray(xp), jnp.asarray(yp), wj)
        pred = np.asarray(pred)[:w, :]
        model.layers_outputs = {0: pred}
        return ({'output_losses': [float(out_loss)],
                 'regularization_loss': float(reg)}, pred)

    def train(self, context):
        self.selector(context)
        for X, y in self.selector.get():
            losses, pred = self._run(X, y, training=True)
            self._tally_losses(context, losses)
            self.selector.put(pred if self.delist_result else [pred])

    def test(self, context):
        from ..nn.metrics import multiclass_accuracy
        self.selector(context)
        for X, y in self.selector.get():
            losses, pred = self._run(X, y, training=False)
            self._tally_losses(context, {
                'output_losses': losses['output_losses']})
            # per-column char accuracy on labeled (non-background) columns
            y_np = np.asarray(y)
            labeled = y_np.sum(axis=1) > 0
            if labeled.any():
                acc = multiclass_accuracy(pred[labeled], y_np[labeled])
                context.setdefault('metrics', {}).setdefault(
                    self.name, []).append(acc)
            self.selector.put(pred if self.delist_result else [pred])


class Modes(Enum):
    TRAIN_MONOCHROME = 0
    TRAIN_PARAGRAPH = 1
    TRAIN_LINE = 2
    TRAIN_CHAR = 3
    TRAIN_ALL = 4
    PREDICT = 5


def make_context_maker(mode=Modes.PREDICT):
    """Initial context per mode from dataset layers (reference :412-483)."""
    def to_gpu(arr):
        return DB.copy(arr)

    if mode is Modes.TRAIN_MONOCHROME:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(*args, layer_tags=['image', 'monochrome'],
                                      **kwargs)
            return {
                'monochrome_X': to_gpu(layers['image']),
                'monochrome_y': to_gpu(layers['monochrome']),
            }

    elif mode is Modes.TRAIN_PARAGRAPH:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(
                *args, layer_tags=['monochrome', 'paragraph'], **kwargs)
            return {
                'paragraph_X': to_gpu(layers['monochrome']),
                'paragraph_y': to_gpu(layers['paragraph']),
            }

    elif mode is Modes.TRAIN_LINE:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(
                *args, layer_tags=['monochrome', 'paragraph', 'line'], **kwargs)
            return {
                'monochrome_pred_cpu': layers['monochrome'],
                'paragraph_pred_cpu': layers['paragraph'],
                'line_cpu': layers['line'],
            }

    elif mode is Modes.TRAIN_CHAR:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(
                *args, layer_tags=['monochrome', 'paragraph', 'line', 'char'],
                **kwargs)
            return {
                'monochrome_pred_cpu': layers['monochrome'],
                'paragraph_pred_cpu': layers['paragraph'],
                'line_cpu': layers['line'],
                'char_cpu': layers['char'],
            }

    elif mode is Modes.TRAIN_ALL:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(
                *args,
                layer_tags=['image', 'monochrome', 'paragraph', 'line', 'char'],
                **kwargs)
            return {
                'monochrome_X': to_gpu(layers['image']),
                'monochrome_y': to_gpu(layers['monochrome']),
                'paragraph_y': to_gpu(layers['paragraph']),
                'line_cpu': layers['line'],
                'char_cpu': layers['char'],
            }

    else:
        def make_context(dataset_get_func, args=(), kwargs={}):
            layers = dataset_get_func(*args, layer_tags=['image'], **kwargs)
            return {'monochrome_X': to_gpu(layers['image'])}

    return make_context


def make_model_system(input_shape, optimizer=None, progress_tracker=None,
                      weights=None, mode=Modes.PREDICT, bucketed=True):
    """Assemble the mode-specific component pipeline (reference :486-717).

    Returns (model_system, models, component_names).  `bucketed` enables
    shape bucketing on the Line/Char predict paths (exact; see
    bucketing.py) — set False to force per-shape compilation.
    """
    def get_result(components):
        order = [
            'Monochrome', 'rename_monochrome',
            'Paragraph', 'move_from_gpu_paragraph',
            'ParagraphCrop', 'move_to_gpu_paragraph_crop', 'rename_line',
            'Line', 'move_from_gpu_line',
            'LineCrop',
            'CharLabel', 'move_to_gpu_char_label',
            'Char', 'move_from_gpu_char',
            'PredToText',
        ]
        model_system = ModelSystem([
            components[component_name]
            for component_name in order
            if component_name in components.keys()
        ])
        models = {
            model_name: components[model_name].model
            for model_name in ['Monochrome', 'Paragraph', 'Line', 'Char']
            if model_name in components.keys()
        }
        for model_name, model in models.items():
            if progress_tracker is not None:
                model.init_progress_tracker(progress_tracker, model_name)
            if weights is not None:
                model.set_weights(weights)
        names = [
            component_name
            for component_name in order
            if component_name in [
                'Monochrome', 'Paragraph', 'ParagraphCrop', 'Line',
                'LineCrop', 'CharLabel', 'Char', 'PredToText',
            ] and component_name in components.keys()
        ]
        return model_system, models, names

    def make_monochrome_component():
        return ModelComponent(
            'Monochrome', make_monochrome(input_shape, optimizer),
            StringSelector('monochrome_X', 'monochrome_y', 'monochrome_pred'),
            delist_result=True)

    if mode is Modes.TRAIN_MONOCHROME:
        return get_result({'Monochrome': make_monochrome_component()})

    def make_paragraph_component():
        return ModelComponent(
            'Paragraph', make_paragraph(input_shape, optimizer),
            StringSelector('paragraph_X', 'paragraph_y', 'paragraph_pred'),
            delist_result=True)

    if mode is Modes.TRAIN_PARAGRAPH:
        return get_result({'Paragraph': make_paragraph_component()})

    def make_paragraph_crop_component():
        crop_and_rotate_paragraphs = CropAndRotateParagraphs(
            min(4, os.cpu_count()))

        @track_function('ParagraphCrop', 'forward', progress_tracker)
        def paragraph_crop_func(context):
            def make_subelements_divisible_by(arrays, y, x):
                return [
                    [make_divisible_by(t, y, x) for t in array]
                    for array in arrays
                ]
            old_labels = ['monochrome_pred_cpu', 'line_cpu', 'char_cpu']
            new_labels = ['cropped_monochrome_cpu', 'cropped_line_cpu',
                          'cropped_char_cpu']
            if mode is Modes.TRAIN_LINE:
                old_labels.pop()
                new_labels.pop()
            if mode is Modes.PREDICT:
                old_labels = old_labels[:1]
                new_labels = new_labels[:1]
            mask, *arrays = get_from_context(context, [
                'paragraph_pred_cpu', *old_labels])
            results = make_subelements_divisible_by(
                crop_and_rotate_paragraphs(mask, arrays), 16, 16)
            put_to_context(context, new_labels, results)
        return RawFunctionComponent(paragraph_crop_func)

    def make_line_component():
        selector = LineSelector('cropped_monochrome', 'cropped_line',
                                'line_pred')
        model = make_line(input_shape, optimizer)
        if bucketed:
            if mode is Modes.PREDICT:
                return FastLineComponent('Line', model, selector,
                                         delist_result=True,
                                         bucket=PARAGRAPH_BUCKET)
            return FastLineTrainComponent('Line', model, selector,
                                          delist_result=True)
        return ModelComponent('Line', model, selector, delist_result=True)

    if mode is Modes.TRAIN_LINE:
        return get_result({
            'ParagraphCrop': make_paragraph_crop_component(),
            'move_to_gpu_paragraph_crop': make_move_to_gpu_component([
                ('cropped_monochrome_cpu', 'cropped_monochrome'),
                ('cropped_line_cpu', 'cropped_line'),
            ]),
            'Line': make_line_component(),
        })

    def make_line_crop_component():
        crop_rotate_and_zoom_lines = CropRotateAndZoomLines(
            min(8, os.cpu_count()),
            CHAR_INPUT_HEIGHT, CHAR_FIXED_WIDTH)

        @track_function('LineCrop', 'forward', progress_tracker)
        def line_crop_func(context):
            old_labels = ['cropped_monochrome_cpu', 'cropped_char_cpu']
            new_labels = ['cropped_2_monochrome_cpu', 'cropped_2_char_cpu']
            if mode is Modes.PREDICT:
                old_labels = old_labels[:1]
                new_labels = new_labels[:1]
            masks, *arrays = get_from_context(context, [
                'line_pred_cpu', *old_labels])
            results = crop_rotate_and_zoom_lines(masks, arrays)
            put_to_context(context, new_labels, results)
        return RawFunctionComponent(line_crop_func)

    def make_char_label_component():
        label_char = LabelChar(min(8, os.cpu_count()))

        @track_function('CharLabel', 'forward', progress_tracker)
        def char_label_func(context):
            lines = get_from_context(context, ['cropped_2_char_cpu'])[0]
            result = label_char(lines)
            put_to_context(context, ['char_labels_cpu'], [result])
        return RawFunctionComponent(char_label_func)

    def make_char_component():
        selector = CharSelector('cropped_2_monochrome', 'char_labels',
                                'char_pred')
        model = make_char(input_shape, optimizer)
        if bucketed:
            if mode is Modes.PREDICT:
                return FastCharComponent('Char', model, selector,
                                         delist_result=True,
                                         bucket=LINE_WIDTH_BUCKET)
            return FastCharTrainComponent('Char', model, selector,
                                          delist_result=True)
        return ModelComponent('Char', model, selector, delist_result=True)

    if mode is Modes.TRAIN_CHAR:
        return get_result({
            'ParagraphCrop': make_paragraph_crop_component(),
            'rename_line': make_rename_in_context_component([
                ('cropped_line_cpu', 'line_pred_cpu'),
            ]),
            'LineCrop': make_line_crop_component(),
            'CharLabel': make_char_label_component(),
            'move_to_gpu_char_label': make_move_to_gpu_component([
                ('cropped_2_monochrome_cpu', 'cropped_2_monochrome'),
                ('char_labels_cpu', 'char_labels'),
            ]),
            'Char': make_char_component(),
        })

    def make_pred_to_text_component():
        pred_to_text = PredToText(min(8, os.cpu_count()))

        @track_function('PredToText', 'forward', progress_tracker)
        def pred_to_text_func(context):
            predictions = get_from_context(context, ['char_pred_cpu'])[0]
            result = pred_to_text(predictions)
            put_to_context(context, ['text'], [result])
        return RawFunctionComponent(pred_to_text_func)

    if mode is Modes.TRAIN_ALL:
        components = {
            'Monochrome': make_monochrome_component(),
            'rename_monochrome': make_rename_in_context_component([
                ('monochrome_pred', 'paragraph_X'),
            ]),
            'Paragraph': make_paragraph_component(),
            'move_from_gpu_paragraph': make_move_from_gpu_component([
                ('monochrome_pred', 'monochrome_pred_cpu'),
                ('paragraph_pred', 'paragraph_pred_cpu'),
            ]),
            'ParagraphCrop': make_paragraph_crop_component(),
            'move_to_gpu_paragraph_crop': make_move_to_gpu_component([
                ('cropped_monochrome_cpu', 'cropped_monochrome'),
                ('cropped_line_cpu', 'cropped_line'),
            ]),
            'Line': make_line_component(),
            'move_from_gpu_line': make_move_from_gpu_component([
                ('line_pred', 'line_pred_cpu'),
            ]),
            'LineCrop': make_line_crop_component(),
            'CharLabel': make_char_label_component(),
            'move_to_gpu_char_label': make_move_to_gpu_component([
                ('cropped_2_monochrome_cpu', 'cropped_2_monochrome'),
                ('char_labels_cpu', 'char_labels'),
            ]),
            'Char': make_char_component(),
        }
        return get_result(components)

    # PREDICT
    components = {
        'Monochrome': make_monochrome_component(),
        'rename_monochrome': make_rename_in_context_component([
            ('monochrome_pred', 'paragraph_X'),
        ]),
        'Paragraph': make_paragraph_component(),
        'move_from_gpu_paragraph': make_move_from_gpu_component([
            ('monochrome_pred', 'monochrome_pred_cpu'),
            ('paragraph_pred', 'paragraph_pred_cpu'),
        ]),
        'ParagraphCrop': make_paragraph_crop_component(),
        'move_to_gpu_paragraph_crop': make_move_to_gpu_component([
            ('cropped_monochrome_cpu', 'cropped_monochrome'),
        ]),
        'Line': make_line_component(),
        'move_from_gpu_line': make_move_from_gpu_component([
            ('line_pred', 'line_pred_cpu'),
        ]),
        'LineCrop': make_line_crop_component(),
        'move_to_gpu_char_label': make_move_to_gpu_component([
            ('cropped_2_monochrome_cpu', 'cropped_2_monochrome'),
        ]),
        'Char': make_char_component(),
        'move_from_gpu_char': make_move_from_gpu_component([
            ('char_pred', 'char_pred_cpu'),
        ]),
        'PredToText': make_pred_to_text_component(),
    }
    return get_result(components)
