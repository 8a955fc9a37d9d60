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
        self._topo = None
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

        self.opt_state = None
        self._step_cache = {}

        self.unravel_model()

    # ------------------------------------------------------------------
    # Graph flattening.
    #
    # The flat `parent/child` leaf names ARE the checkpoint namespace
    # (model_weights.json keys), so the naming contract matches the
    # reference (models.py:109-158); the algorithm is different: a
    # memoized source-resolution pass — every (namespace, source) entry
    # resolves lazily to the flat leaf names that produce it, inlining
    # each submodel exactly once — instead of rewriting one shared
    # relations dict in place per submodel.
    # ------------------------------------------------------------------
    def unravel_model(self):
        flat_layers = {}
        flat_relations = {}

        def inline(model, prefix, resolve_input):
            """Register `model`'s leaf layers/relations under `prefix`.
            `resolve_input(i)` gives the flat sources feeding the model's
            input slot i.  Returns {out_id: [flat sources]}."""
            rels = {dst: make_list_if_not(srcs)
                    for dst, srcs in model.ravelled_relations.items()}
            inlined = {}

            def submodel(name):
                if name not in inlined:
                    feeds = rels.get(name, [])
                    inlined[name] = inline(
                        model.ravelled_layers[name], f'{prefix}{name}/',
                        lambda i, feeds=feeds: resolve(feeds[i]))
                return inlined[name]

            def resolve(src):
                # int: model input slot; (name, out_id, ...): selected
                # submodel outputs; str: a leaf layer (one flat source)
                # or a submodel (all its outputs, in output order).
                if isinstance(src, int):
                    return list(resolve_input(src))
                if isinstance(src, tuple) and len(src) > 1:
                    outs = submodel(src[0])
                    return [s for out_id in src[1:] for s in outs[out_id]]
                if isinstance(model.ravelled_layers.get(src), Model):
                    sub = model.ravelled_layers[src]
                    outs = submodel(src)
                    return [s for out_id in range(sub.get_outputs_count())
                            for s in outs[out_id]]
                return [f'{prefix}{src}']

            for name, layer in model.ravelled_layers.items():
                if not isinstance(layer, Model):
                    flat_layers[f'{prefix}{name}'] = layer

            outputs = {}
            for dst, srcs in rels.items():
                if (not isinstance(dst, int)
                        and isinstance(model.ravelled_layers.get(dst),
                                       Model)):
                    submodel(dst)       # inlined on demand by consumers
                    continue
                flat_srcs = [s for src in srcs for s in resolve(src)]
                if isinstance(dst, int):
                    outputs[dst] = flat_srcs
                else:
                    flat_relations[f'{prefix}{dst}'] = flat_srcs
            return outputs

        outputs = inline(self, '', lambda i: [i])
        for out_id, srcs in outputs.items():
            flat_relations[out_id] = srcs

        self.layers = flat_layers
        self.relations = flat_relations
        self._topo = None
        for layer_name, layer in self.layers.items():
            layer._set_name(layer_name)

    def get_leaf_layers(self):
        if self.layers is None:
            self.unravel_model()
        return self.layers

    def __getitem__(self, key):
        return self.layers[key]

    # ------------------------------------------------------------------
    # Graph order + shape inference
    # ------------------------------------------------------------------
    def _topo_order(self):
        """Producers-first ordering of the nodes reachable from the model
        outputs (leaf layer names + int output ids), computed once per
        flattened graph.  Raises RecursionError on cycles — same contract
        as the reference's recursive shape DFS (models.py:66-101), but
        iterative, so deep chains can't overflow the Python stack."""
        if self._topo is not None:
            return self._topo

        order = []
        OPEN, DONE = 1, 2
        state = {}
        sinks = sorted(k for k in self.relations if isinstance(k, int))
        stack = [(n, False) for n in reversed(sinks)]
        while stack:
            node, expanded = stack.pop()
            if expanded:
                state[node] = DONE
                order.append(node)
                continue
            if state.get(node) == DONE:
                continue
            if state.get(node) == OPEN:
                raise RecursionError(
                    f'Looped on {node} layer, check relations')
            state[node] = OPEN
            stack.append((node, True))
            for src in self.relations[node]:
                if isinstance(src, int):
                    continue
                if state.get(src) == OPEN:
                    raise RecursionError(
                        f'Looped on {src} layer, check relations')
                if state.get(src) != DONE:
                    stack.append((src, False))

        self._topo = order
        return order

    def initialize(self, input_shapes):
        """Shape inference + lazy parameter init: one linear pass over the
        topological order (contract of reference models.py:55-107)."""
        input_shapes = make_list_if_not(input_shapes)
        self.input_shapes = input_shapes

        shapes = {}
        for node in self._topo_order():
            node_input_shapes = [
                input_shapes[src] if isinstance(src, int) else shapes[src]
                for src in self.relations[node]]
            if isinstance(node, int):
                continue
            layer = self.layers[node]
            if not layer.is_initialized:
                layer.initialize(node_input_shapes)
            out = layer.get_output_shapes(node_input_shapes)
            shapes[node] = out[0] if isinstance(out, list) else out

        never_visited = [name for name in self.layers if name not in shapes]
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
    # Shape queries (surface of reference models.py:284-329)
    # ------------------------------------------------------------------
    def get_all_output_shapes(self, input_shapes):
        """([model output shapes], {leaf name: [its output shapes]}) with
        plain-int tuples, via one pass over the topological order."""
        input_shapes = make_list_if_not(input_shapes)
        first_shape = {}    # node -> first output shape, for consumers
        all_shapes = {}
        model_outputs = {}
        for node in self._topo_order():
            node_inputs = [
                input_shapes[src] if isinstance(src, int) else first_shape[src]
                for src in self.relations[node]]
            if isinstance(node, int):
                model_outputs[node] = tuple(int(x) for x in node_inputs[0])
                continue
            outs = make_list_if_not(
                self.layers[node].get_output_shapes(node_inputs))
            outs = [tuple(int(x) for x in s) for s in outs]
            all_shapes[node] = outs
            first_shape[node] = outs[0]
        return ([model_outputs[k] for k in range(self.outputs_count)],
                all_shapes)

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
    # Receptive fields
    # ------------------------------------------------------------------
    def get_receptive_fields(self):
        """Receptive field of every RF-changing leaf's output position 0
        w.r.t. the model inputs, along both spatial axes.

        Same report dict as the reference (models.py:340-374): per input,
        position count, y/x min-max, and whether the covered set is a solid
        interval.  Different algorithm: instead of per-(layer, position)
        recursive set memoization, each target layer gets one
        reverse-topological frontier sweep in which entire coverage sets
        travel as sorted numpy position arrays through the layers'
        vectorized `rf_preimage` maps (layers.py); RF-neutral layers need
        no graph splicing because their preimage is the identity."""
        assert self.is_initialized, (
            'The model must be initialized before calling this method')
        assert self.is_fully_convolutional(), (
            'This method is only available for Fully Convolutional Networks (FCN)')

        order = self._topo_order()
        result = {}
        for target in order:
            if isinstance(target, int):
                continue
            if not self.layers[target].changes_receptive_field():
                continue
            cover_y = self._input_coverage(target, 0, order)
            cover_x = self._input_coverage(target, 1, order)
            report = {}
            for in_id in range(self.inputs_count):
                pos_y, pos_x = cover_y.get(in_id), cover_x.get(in_id)
                if pos_y is None or pos_x is None:
                    continue
                cnt_y, min_y, max_y = len(pos_y), int(pos_y[0]), int(pos_y[-1])
                cnt_x, min_x, max_x = len(pos_x), int(pos_x[0]), int(pos_x[-1])
                report[f'input {in_id}'] = {
                    'cnt': (cnt_y, cnt_x),
                    'y': (min_y, max_y),
                    'x': (min_x, max_x),
                    'is_solid_y': (cnt_y == max_y - min_y + 1),
                    'is_solid_x': (cnt_x == max_x - min_x + 1),
                }
            result[target] = report
        return result

    def _input_coverage(self, target, axis, order):
        """{input_id: sorted position array} influencing `target`'s output
        position 0 along `axis`.  Seeds {target: [0]} and sweeps the graph
        consumers-before-producers, expanding each node's covered positions
        through its rf_preimage into its sources (union at fan-ins)."""
        cover = {target: np.zeros(1, dtype=np.int64)}
        input_cover = {}
        for node in reversed(order[:order.index(target) + 1]):
            positions = cover.pop(node, None)
            if positions is None:
                continue
            pre = (None if isinstance(node, int)
                   else self.layers[node].rf_preimage(axis, positions))
            for slot, src in enumerate(self.relations[node]):
                src_positions = positions if pre is None else pre[slot]
                bucket = input_cover if isinstance(src, int) else cover
                prev = bucket.get(src)
                bucket[src] = (src_positions if prev is None
                               else np.union1d(prev, src_positions))
        return input_cover

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
