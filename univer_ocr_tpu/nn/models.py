"""DAG model container, compiled to single jitted steps.

Keeps the reference's `Model(layers, relations, loss)` schema
(models.py:31-503) — including nested-model flattening into `parent/child`
leaf names, which *is* the model_weights.json checkpoint namespace — but
executes entirely differently:

  * the DAG is traversed once at trace time to build a pure
    `forward_fn(params, inputs)`; XLA sees one fused program per model;
  * training is one jitted step: `value_and_grad` over the params pytree
    (+ regularization), then the optimizer's pytree update, with buffer
    donation — replacing the reference's recursive per-layer backward with
    gradient summation at fan-outs (models.py:201-230), `update_grads`,
    and `clear_grads`;
  * compiled steps are cached per input-shape signature (crops and lines
    have varying shapes; callers bucket shapes to bound recompilation).

Gradient-at-fan-out summation, multi-output losses, per-layer regularizers,
receptive-field analysis, weight (de)serialization, and NaN scanning all
behave like the reference (verified by tests/test_models.py).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .help_func import make_list_if_not
from .layers import BaseLayer
from .losses import SoftmaxCrossEntropy
from .progress_tracker import track_method


class BaseModel(BaseLayer):
    def compute_loss_and_gradients(self, X, y):
        raise NotImplementedError()

    def train(self, X, y):
        raise NotImplementedError()

    def test(self, X, y):
        raise NotImplementedError()

    def predict(self, X):
        raise NotImplementedError()


def _shape_sig(arrays):
    return tuple((tuple(a.shape), str(jnp.asarray(a).dtype)) for a in arrays)


class Model(BaseModel):
    """DAG of named layers with integer-keyed model inputs/outputs.

    `relations` maps destination -> source(s); integer destinations are
    model outputs, integer sources are model inputs (reference
    models.py:31-53).  Nested Models are flattened into leaf layers named
    `parent/child` (reference `unravel_model`, models.py:109-158).
    """

    def __init__(self, layers, relations, loss=SoftmaxCrossEntropy(),
                 *args, **kwargs):
        super().__init__(*args, **kwargs)

        if not isinstance(layers, dict):
            raise TypeError(
                f'layers argument must be dict, found: {type(layers).__name__}')
        if not isinstance(relations, dict):
            raise TypeError(
                f'relations argument must be dict, found: {type(relations).__name__}')

        self.ravelled_layers = layers
        self.ravelled_relations = relations
        self.layers = None
        self.relations = None
        self.relations_backward = {}
        # model inputs may appear as bare int values or inside source
        # lists (the reference only scanned bare ints, models.py:45, which
        # crashes graphs whose inputs are all multi-input edges)
        input_ids = [
            src
            for v in relations.values()
            for src in (v if isinstance(v, (list, tuple)) else [v])
            if isinstance(src, int)
        ]
        self.inputs_count = max(input_ids) + 1
        self.outputs_count = max(
            k for k, v in relations.items() if isinstance(k, int)) + 1
        self.layers_outputs = {}
        self.loss = loss
        self.input_grads = {}
        self.is_initialized = False
        self._receptive_fields = {}

        self.opt_state = None
        self._step_cache = {}

        self.unravel_model()

    # ------------------------------------------------------------------
    # Graph flattening (semantics of reference models.py:109-158)
    # ------------------------------------------------------------------
    def unravel_model(self):
        relations = {dst: make_list_if_not(src)
                     for dst, src in self.ravelled_relations.items()}
        for layer_name, layer in self.ravelled_layers.items():
            if not isinstance(layer, Model):
                continue

            layer.unravel_model()

            # Inner relations, renamed into this model's namespace; inner
            # int sources resolve to the submodel's own input sources.
            new_layer_relations = {}
            for dst, srcs in layer.relations.items():
                new_srcs = []
                for src in srcs:
                    if isinstance(src, int):
                        new_srcs.append(relations[layer_name][src])
                    else:
                        new_srcs.append(f'{layer_name}/{src}')
                dst_name = dst if isinstance(dst, int) else f'{layer_name}/{dst}'
                new_layer_relations[dst_name] = new_srcs

            # Outer edges that referenced the submodel now reference the
            # submodel's output-producing leaves.
            for dst, srcs in relations.items():
                new_srcs = []
                for src in srcs:
                    if isinstance(src, str) and layer_name == src:
                        for out_id in range(layer.get_outputs_count()):
                            new_srcs.extend(new_layer_relations[out_id])
                    elif (isinstance(src, tuple) and len(src) > 1
                          and layer_name == src[0]):
                        for out_id in src[1:]:
                            new_srcs.extend(new_layer_relations[out_id])
                    else:
                        new_srcs.append(src)
                relations[dst] = new_srcs

            for out_id in range(layer.get_outputs_count()):
                del new_layer_relations[out_id]
            relations.update(new_layer_relations)
            del relations[layer_name]

        self.layers = self.get_leaf_layers()
        self.relations = relations

        for layer_name, layer in self.layers.items():
            layer._set_name(layer_name)

    def get_leaf_layers(self):
        if self.layers is not None:
            return self.layers
        result = {}
        for layer_name, layer in self.ravelled_layers.items():
            if isinstance(layer, Model):
                for name, sub_layer in layer.get_leaf_layers().items():
                    result[f'{layer_name}/{name}'] = sub_layer
            else:
                result[layer_name] = layer
        return result

    def __getitem__(self, key):
        return self.layers[key]

    # ------------------------------------------------------------------
    # Shape inference + lazy parameter init (reference models.py:55-107)
    # ------------------------------------------------------------------
    def initialize(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        self.input_shapes = input_shapes

        keys = list(set(self.layers.keys()) | set(self.relations.keys()))
        output_keys = [k for k in keys if isinstance(k, int)]

        visited = {name: False for name in keys}
        currently_being_visited = {name: False for name in keys}
        layer_shapes = {name: None for name in keys}

        def rec_forward_initialize(layer_name):
            visited[layer_name] = True
            if currently_being_visited[layer_name]:
                raise RecursionError(
                    f'Looped on {layer_name} layer, check relations')
            if layer_shapes[layer_name] is not None:
                return layer_shapes[layer_name]
            currently_being_visited[layer_name] = True

            layer_input_shapes = []
            for i, src in enumerate(self.relations[layer_name]):
                if isinstance(src, int):
                    layer_input_shapes.append(input_shapes[src])
                else:
                    tmp = rec_forward_initialize(src)
                    if isinstance(tmp, list):
                        tmp = tmp[0]
                    layer_input_shapes.append(tmp)

                if src not in self.relations_backward:
                    self.relations_backward[src] = {}
                self.relations_backward[src][layer_name] = i

            if isinstance(layer_name, int):
                return

            if not self.layers[layer_name].is_initialized:
                self.layers[layer_name].initialize(layer_input_shapes)
            layer_shapes[layer_name] = self.layers[layer_name].get_output_shapes(
                layer_input_shapes)

            currently_being_visited[layer_name] = False
            return layer_shapes[layer_name]

        for output in output_keys:
            rec_forward_initialize(output)

        never_visited = [name for name, flag in visited.items() if not flag]
        if never_visited:
            print(f'These layers have never been visited: {never_visited}')

        self.is_initialized = True

    # ------------------------------------------------------------------
    # Params pytree assembly
    # ------------------------------------------------------------------
    @property
    def params(self):
        """{leaf_name: {param_name: array}} for leaves that have params."""
        return {name: layer.params
                for name, layer in self.layers.items() if layer.params}

    @params.setter
    def params(self, new_params):
        if not new_params:
            return
        for name, layer_params in new_params.items():
            self.layers[name].params = dict(layer_params)

    def _trainable_layer_names(self):
        if not self.trainable:
            return set()
        return {name for name, layer in self.layers.items()
                if layer.params and layer.trainable}

    # ------------------------------------------------------------------
    # Pure forward over the DAG (replaces reference models.py:163-199)
    # ------------------------------------------------------------------
    def forward_fn(self, params, inputs):
        """Pure: (params pytree, list of input arrays) -> list of outputs."""
        outputs = {}

        def rec_forward(layer_name):
            if layer_name in outputs:
                return outputs[layer_name]

            next_inputs = []
            for src in self.relations[layer_name]:
                if isinstance(src, int):
                    next_inputs.append(inputs[src])
                else:
                    next_inputs.append(rec_forward(src))

            if isinstance(layer_name, int):
                outputs[layer_name] = next_inputs[0]
                return outputs[layer_name]

            layer = self.layers[layer_name]
            result = layer.apply(params.get(layer_name, {}), next_inputs)
            if isinstance(result, list):
                result = result[0]
            outputs[layer_name] = result
            return result

        return [rec_forward(k) for k in range(self.outputs_count)]

    def _loss_for_output(self, key):
        loss = self.loss[key] if isinstance(self.loss, list) else self.loss
        return type(loss).fn if not callable(getattr(loss, 'fn', None)) else loss.fn

    def loss_fn(self, params, X_list, y_list):
        """Pure: total loss (outputs + regularization) with aux details."""
        preds = self.forward_fn(params, X_list)
        out_losses = []
        for key in range(self.outputs_count):
            fn = self._loss_for_output(key)
            out_losses.append(fn(preds[key], y_list[key]))
        reg_loss = self.regularization_fn(params)
        total = sum(out_losses) + reg_loss
        return total, (out_losses, reg_loss, preds)

    def regularization_fn(self, params):
        total = 0.0
        for name, layer in self.layers.items():
            if layer.regularizer is not None and name in params:
                total = total + layer.regularization(params[name])
        return total

    # ------------------------------------------------------------------
    # Compiled steps (shape-signature cached)
    # ------------------------------------------------------------------
    def _optimizer(self):
        opt = self.optimizer
        if opt is None:
            for layer in self.layers.values():
                if getattr(layer, 'optimizer', None) is not None:
                    opt = layer.optimizer
                    break
        return opt

    def _ensure_opt_state(self, trainable_params):
        opt = self._optimizer()
        if opt is None:
            return None
        if self.opt_state is None:
            self.opt_state = opt.init_state(trainable_params)
        return self.opt_state

    def _get_step(self, kind, sig):
        cache_key = (kind, sig)
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]

        opt = self._optimizer()
        trainable = tuple(sorted(self._trainable_layer_names()))

        if kind == 'train':
            def step(params, opt_state, lr, X_list, y_list):
                t_params = {n: params[n] for n in trainable}
                f_params = {n: p for n, p in params.items() if n not in trainable}

                def wrapped(tp):
                    return self.loss_fn({**tp, **f_params}, X_list, y_list)

                (total, aux), grads = jax.value_and_grad(
                    wrapped, has_aux=True)(t_params)
                out_losses, reg_loss, preds = aux
                new_t, new_opt_state = opt.update(t_params, grads, opt_state, lr)
                new_params = {**new_t, **f_params}
                return new_params, new_opt_state, out_losses, reg_loss, preds

            fn = jax.jit(step, donate_argnums=(0, 1))

        elif kind == 'test':
            def step(params, X_list, y_list):
                total, (out_losses, reg_loss, preds) = self.loss_fn(
                    params, X_list, y_list)
                return out_losses, reg_loss, preds

            fn = jax.jit(step)

        else:  # predict
            fn = jax.jit(lambda params, X_list: self.forward_fn(params, X_list))

        self._step_cache[cache_key] = fn
        return fn

    def _compute_dtype(self):
        """dtype the model computes in = dtype of its first parameter."""
        for layer in self.layers.values():
            for v in layer.params.values():
                return v.dtype
        return None

    def _cast(self, arrays):
        """Cast host inputs to the model's compute dtype (NumPy would have
        promoted implicitly; XLA convs require matching dtypes)."""
        dtype = self._compute_dtype()
        out = []
        for a in arrays:
            a = jnp.asarray(a)
            if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
                a = a.astype(dtype)
            out.append(a)
        return out

    # ------------------------------------------------------------------
    # Host-facing API (reference models.py:232-271 surface)
    # ------------------------------------------------------------------
    def compute_loss_and_gradients(self, X, y):
        """Loss + grads without an optimizer update (reference :232-248).

        Also records `self.input_grads` (gradients w.r.t. model inputs) for
        the gradient-check harness (reference models.py:227-230).
        """
        X = self._cast(make_list_if_not(X))
        y = self._cast(make_list_if_not(y))

        def wrt_inputs(X_list):
            total, aux = self.loss_fn(self.params, X_list, y)
            return total, aux

        (total, (out_losses, reg_loss, preds)), in_grads = jax.value_and_grad(
            wrt_inputs, has_aux=True)(X)
        self.input_grads = {k: [in_grads[k]] for k in range(self.inputs_count)}
        self.layers_outputs = {k: preds[k] for k in range(self.outputs_count)}
        return {'output_losses': [float(l) for l in out_losses],
                'regularization_loss': float(reg_loss)}

    @track_method('forward')
    def forward(self, inputs):
        inputs = make_list_if_not(inputs)
        if not self.is_initialized:
            self.initialize_from_X(inputs)
        inputs = self._cast(inputs)
        fn = self._get_step('predict', _shape_sig(inputs))
        preds = fn(self.params, inputs)
        self.layers_outputs = {k: preds[k] for k in range(self.outputs_count)}
        return [preds[k] for k in range(self.outputs_count)]

    def train(self, X, y):
        """One optimizer step; returns the reference's losses dict."""
        X = make_list_if_not(X)
        if not self.is_initialized:
            self.initialize_from_X([jnp.asarray(x) for x in X])
        X = self._cast(X)
        y = self._cast(make_list_if_not(y))

        params = self.params
        trainable = {n: params[n] for n in self._trainable_layer_names()}
        if not trainable:
            # Nothing to update; fall back to loss computation only.
            return self.test(X, y)
        opt = self._optimizer()
        opt_state = self._ensure_opt_state(trainable)

        fn = self._get_step('train', _shape_sig(X) + _shape_sig(y))
        # dashboard timing: the jitted step fuses fwd+bwd into one XLA
        # program, so the honest split is 'forward' = host dispatch time
        # (async) and 'backward' = waiting out the device execution
        # (progress_tracker.py module docstring)
        tracker = self.progress_tracker
        tracker.start_tracking(self.name, 'forward')
        new_params, new_opt_state, out_losses, reg_loss, preds = fn(
            params, opt_state, jnp.asarray(opt.lr, dtype=jnp.float32), X, y)
        tracker.stop_tracking(self.name, 'forward')
        tracker.start_tracking(self.name, 'backward')
        out_losses = [float(l) for l in out_losses]
        tracker.stop_tracking(self.name, 'backward')
        self.params = new_params
        self.opt_state = new_opt_state
        self.layers_outputs = {k: preds[k] for k in range(self.outputs_count)}
        return {'output_losses': out_losses,
                'regularization_loss': float(reg_loss)}

    def test(self, X, y):
        X = make_list_if_not(X)
        if not self.is_initialized:
            self.initialize_from_X([jnp.asarray(x) for x in X])
        X = self._cast(X)
        y = self._cast(make_list_if_not(y))
        fn = self._get_step('test', _shape_sig(X) + _shape_sig(y))
        tracker = self.progress_tracker
        tracker.start_tracking(self.name, 'forward')
        out_losses, reg_loss, preds = fn(self.params, X, y)
        out_losses = [float(l) for l in out_losses]
        tracker.stop_tracking(self.name, 'forward')
        self.layers_outputs = {k: preds[k] for k in range(self.outputs_count)}
        return {'output_losses': out_losses}

    def predict(self, X):
        return self.forward(X)

    # ------------------------------------------------------------------
    # Shape queries (reference models.py:284-329)
    # ------------------------------------------------------------------
    def get_all_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        output_shapes = {}
        all_output_shapes = {}

        def as_int_tuples(shapes):
            shapes = make_list_if_not(shapes)
            result = []
            for shape in shapes:
                assert isinstance(shape, tuple)
                result.append(tuple(int(x) for x in shape))
            return result

        def rec_get_output_shapes(layer_name):
            if layer_name in output_shapes:
                return output_shapes[layer_name]

            layer_input_shapes = []
            for src in self.relations[layer_name]:
                if isinstance(src, int):
                    layer_input_shapes.append(input_shapes[src])
                else:
                    tmp = rec_get_output_shapes(src)
                    if isinstance(tmp, list):
                        tmp = tmp[0]
                    layer_input_shapes.append(tmp)

            if isinstance(layer_name, int):
                return layer_input_shapes[0]

            tmp = self.layers[layer_name].get_all_output_shapes(layer_input_shapes)
            output_shapes[layer_name] = as_int_tuples(tmp[0])
            all_output_shapes.update({
                f'{layer_name}/{k}': as_int_tuples(v) for k, v in tmp[1].items()
            })
            return output_shapes[layer_name]

        result = []
        for output in range(self.outputs_count):
            result.append(rec_get_output_shapes(output))
        all_output_shapes.update(output_shapes)
        return as_int_tuples(result), all_output_shapes

    def get_output_shapes(self, input_shapes):
        return self.get_all_output_shapes(input_shapes)[0]

    def get_outputs_count(self):
        return self.outputs_count

    def is_fully_convolutional(self):
        return all(layer.is_fully_convolutional()
                   for layer in self.layers.values())

    def changes_receptive_field(self):
        return any(layer.changes_receptive_field()
                   for layer in self.layers.values())

    # ------------------------------------------------------------------
    # Receptive fields (reference models.py:340-432)
    # ------------------------------------------------------------------
    def get_receptive_fields(self):
        assert self.is_initialized, (
            'The model must be initialized before calling this method')
        assert self.is_fully_convolutional(), (
            'This method is only available for Fully Convolutional Networks (FCN)')

        for output_id in range(self.get_outputs_count()):
            for axis in range(2):
                self._get_receptive_field(axis, 0, output_id)

        tmp = {
            layer_name: (
                self._receptive_fields[layer_name, 0],
                self._receptive_fields[layer_name, 1])
            for layer_name in self._receptive_fields['relations'].keys()
            if not isinstance(layer_name, int)
        }
        result = {}
        for layer_name, (rf_y, rf_x) in tmp.items():
            result[layer_name] = {}
            for in_id in rf_y.keys():
                rf1_y, rf1_x = rf_y[in_id], rf_x[in_id]
                cnt_y, cnt_x = len(rf1_y), len(rf1_x)
                min_y, max_y = min(rf1_y), max(rf1_y)
                min_x, max_x = min(rf1_x), max(rf1_x)
                result[layer_name][f'input {in_id}'] = {
                    'cnt': (cnt_y, cnt_x),
                    'y': (min_y, max_y),
                    'x': (min_x, max_x),
                    'is_solid_y': (cnt_y == max_y - min_y + 1),
                    'is_solid_x': (cnt_x == max_x - min_x + 1),
                }

        self._clear_receptive_fields_info()
        return result

    def _get_receptive_field(self, axis, position, output_id):
        if (axis, position, output_id) in self._receptive_fields:
            return self._receptive_fields[axis, position, output_id]

        if 'relations' in self._receptive_fields:
            relations = self._receptive_fields['relations']
        else:
            # Splice out layers that don't change the receptive field.
            relations = {dst: srcs for dst, srcs in self.relations.items()}
            for layer_name, layer in self.layers.items():
                if layer.changes_receptive_field():
                    continue
                sources = relations[layer_name]
                destinations = [dst for dst, src in relations.items()
                                if layer_name == src or layer_name in src]
                for dst in destinations:
                    if relations[dst] == layer_name:
                        relations[dst] = sources
                    else:
                        tmp = []
                        for src in relations[dst]:
                            tmp.extend(sources if src == layer_name else [src])
                        relations[dst] = tmp
                del relations[layer_name]
            self._receptive_fields['relations'] = relations

        input_keys = list(range(self.inputs_count))
        all_input_points = {}

        def rec_get_receptive_field(layer_name, axis, pos, out_id):
            if (layer_name, axis, pos, out_id) in all_input_points:
                return all_input_points[layer_name, axis, pos, out_id]
            if isinstance(layer_name, int):
                points = {0: set([pos])}
            else:
                points = self.layers[layer_name]._get_receptive_field(
                    axis, pos, out_id)
            input_points = {in_key: set() for in_key in input_keys}
            for src_id, src in enumerate(relations[layer_name]):
                if isinstance(src, int):
                    input_points[src].update(points[src_id])
                    continue
                for point in points[src_id]:
                    src_input_points = rec_get_receptive_field(src, axis, point, 0)
                    for in_key, in_points in src_input_points.items():
                        input_points[in_key].update(in_points)
            all_input_points[layer_name, axis, pos, out_id] = input_points
            return all_input_points[layer_name, axis, pos, out_id]

        for layer_name in relations.keys():
            self._receptive_fields[layer_name, axis] = rec_get_receptive_field(
                layer_name, axis, 0, 0)

        return rec_get_receptive_field(
            relations[output_id][0], axis, position, 0)

    def _clear_receptive_fields_info(self):
        for layer in self.layers.values():
            layer._clear_receptive_fields_info()
        self._receptive_fields = {}

    # ------------------------------------------------------------------
    # Weights / params bookkeeping (reference models.py:447-484)
    # ------------------------------------------------------------------
    def get_weights(self):
        all_weights = {name: layer.get_weights()
                       for name, layer in self.layers.items()}
        return {name: weights for name, weights in all_weights.items()
                if weights != {}}

    def set_weights(self, weights):
        for name, layer in self.layers.items():
            layer_weights = weights.get(name, None)
            if layer_weights is None:
                continue
            layer.set_weights(layer_weights)
        # Loaded weights invalidate optimizer state momentum built for the
        # previous values only in shape-mismatch cases; keep state otherwise
        # (the reference keeps optimizer state across reloads too).

    def nan_weights(self):
        return any(layer.nan_weights() for layer in self.layers.values())

    def count_parameters(self):
        return sum(layer.count_parameters() for layer in self.layers.values())

    def regularize(self):
        return float(self.regularization_fn(self.params))

    def init_progress_tracker(self, progress_tracker, model_name='model'):
        if self.name is None:
            self.name = model_name
        self.progress_tracker = progress_tracker
        self.progress_tracker.register_layer(self.name)
        for layer in self.layers.values():
            layer.init_progress_tracker(progress_tracker, None)


class Sequential(Model):
    """Layer list -> named chain (reference models.py:487-502)."""

    def __init__(self, layers, *args, **kwargs):
        if not isinstance(layers, list):
            raise TypeError(
                f'layers argument must be list, found: {type(layers).__name__}')

        layers_dict = {}
        relations = {}
        prev_name = 0
        for i, layer in enumerate(layers):
            name = f'{i}_{type(layer).__name__}'
            layers_dict[name] = layer
            relations[name] = prev_name
            prev_name = name
        relations[0] = prev_name

        super().__init__(layers=layers_dict, relations=relations,
                         *args, **kwargs)
