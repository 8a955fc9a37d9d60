"""Layer zoo: config objects over pure ops.

Surface parity with the reference layer zoo (web_app/components/nn/layers/):
same class names, constructor signatures, shape rules, receptive-field
arithmetic, and weight-dict layout (so model_weights.json round-trips).
The execution model is different by design:

  * a layer holds *configuration* plus (optionally) a params dict of jax
    arrays; `apply(params, inputs)` is a pure function that jit-traces —
    there is no cached `_mem`, no hand-written backward, no CPU/GPU dual
    dispatch (reference layers.py:169-237) — autodiff and XLA replace all
    of it;
  * gradients of every layer match the reference's hand-derived backward
    passes (verified by tests/test_gradients.py numerical checks), including
    MaxPool2D's equal-split-among-ties rule via a custom VJP (ops/pool.py).
"""

import numpy as np

import jax.numpy as jnp

from .. import ops
from ..ops.conv import conv_output_shape, unfold_output_shape
from ..ops.pool import pool_output_shape
from ..ops.upsample import upsample_output_shape
from .help_func import make_list_if_not, tuplize
from .progress_tracker import BaseProgressTracker, track_method
from .rng import next_key


def _window_preimage(positions, kernel, padding, stride):
    """Union of the k-wide strided input windows behind `positions`
    (vectorized set expansion for conv/pool receptive fields)."""
    offsets = np.arange(kernel, dtype=np.int64)
    return np.unique(np.asarray(positions)[:, None] * stride - padding + offsets)


class Param:
    """Value+grad pair (reference layers.py:10-21), host-side shim.

    The jitted training path keeps parameters in pytrees, not Param objects;
    this class exists for API familiarity in user code and tests.
    """

    def __init__(self, value, optimizer=None):
        self.value = jnp.asarray(value)
        self.grad = jnp.zeros_like(self.value)
        self.optimizer = optimizer

    def clear_grad(self):
        self.grad = jnp.zeros_like(self.value)


class BaseLayer:
    """Common layer machinery (reference layers.py:24-166).

    Subclasses implement `_apply(params, X)` (single input) or override
    `apply(params, inputs)` (multi-input), plus `get_output_shapes` and
    optionally `init_params` / receptive-field hooks.
    """

    def __init__(self,
                 name=None,
                 input_shapes=None,
                 trainable=True,
                 initializer=ops.kaiming_uniform,
                 regularizer=None,
                 optimizer=None,
                 dtype=jnp.float32):
        self.name = name
        self.dtype = dtype
        self.input_shapes = input_shapes
        self.inputs_count = len(input_shapes) if input_shapes is not None else None
        self.trainable = trainable
        self.initializer = initializer
        self.regularizer = regularizer
        self.optimizer = optimizer

        self.params = {}
        self.is_initialized = True
        self.progress_tracker = BaseProgressTracker()

    # -- lifecycle ---------------------------------------------------------
    def initialize_from_X(self, X):
        X = make_list_if_not(X)
        self.initialize([x.shape for x in X])

    def initialize(self, input_shapes):
        self.input_shapes = make_list_if_not(input_shapes)
        self.inputs_count = len(self.input_shapes)
        self.is_initialized = True

    def init_params(self, key=None):
        """Create this layer's parameter dict (empty by default)."""
        return {}

    # -- compute (pure) ----------------------------------------------------
    def apply(self, params, inputs):
        """Pure forward over a list of inputs -> list of outputs.

        Default semantics mirror reference BaseLayer.forward (layers.py:56-63):
        the layer maps independently over each input.
        """
        return [self._apply(params, X) for X in inputs]

    def _apply(self, params, X):
        raise NotImplementedError()

    def regularization(self, params):
        """Pure regularization penalty over this layer's params."""
        if self.regularizer is None or not params:
            return 0.0
        return sum(self.regularizer.fn(p) for p in params.values())

    # -- host convenience --------------------------------------------------
    @track_method('forward')
    def forward(self, inputs):
        assert self.is_initialized, (
            'You must initialize() layer before calling forward() method')
        return self.apply(self.params, make_list_if_not(inputs))

    # -- shape/graph metadata ---------------------------------------------
    def get_all_output_shapes(self, input_shapes):
        return self.get_output_shapes(input_shapes), {}

    def get_output_shapes(self, input_shapes):
        raise NotImplementedError()

    def get_outputs_count(self):
        return 1

    def is_fully_convolutional(self):
        return True

    def changes_receptive_field(self):
        return False

    def rf_preimage(self, axis, positions):
        """Map output positions (sorted int array, one spatial axis) to the
        source positions that influence them.  Returns {input_slot: array},
        or None meaning the layer is position-identity on every input slot
        (elementwise ops, concat).  Model.get_receptive_fields composes
        these along the DAG."""
        return None

    # -- weights I/O (model_weights.json schema, layers.py:120-140) --------
    def get_weights(self):
        return {name: np.asarray(value).tolist()
                for name, value in self.params.items()}

    def set_weights(self, weights):
        for name in list(self.params.keys()):
            cur_weights = weights.get(name, None)
            if cur_weights is None:
                continue
            cur_weights = np.array(cur_weights)
            error = None
            if np.any(np.isnan(cur_weights)):
                error = 'NaN found in loaded weights'
            elif cur_weights.shape != tuple(self.params[name].shape):
                error = (f'Shapes don`t match: {cur_weights.shape} != '
                         f'{tuple(self.params[name].shape)}')
            if error is not None:
                print(f'{self.name}/{name}: {error}, skipping')
                continue
            self.params[name] = jnp.asarray(cur_weights,
                                            dtype=self.params[name].dtype)

    def nan_weights(self):
        return any(bool(jnp.isnan(v).any()) for v in self.params.values())

    def count_parameters(self, param=None):
        if param is not None:
            return int(np.prod(self.params[param].shape))
        return sum(int(np.prod(v.shape)) for v in self.params.values())

    # -- misc --------------------------------------------------------------
    def _set_name(self, name):
        self.name = name

    def init_progress_tracker(self, progress_tracker, set_names_recursively=False):
        self.progress_tracker = progress_tracker
        self.progress_tracker.register_layer(self.name)


class Concat(BaseLayer):
    """Concatenate all inputs along `axis` (reference layers.py:240-284)."""

    def __init__(self, axis=-1, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.axis = axis
        self.is_initialized = self.inputs_count is not None

    def apply(self, params, inputs):
        if not isinstance(inputs, list):
            return inputs
        return [jnp.concatenate(inputs, axis=self.axis)]

    def get_output_shapes(self, input_shapes):
        input_shapes = np.array(make_list_if_not(input_shapes))
        result = [x for x in input_shapes[0]]
        tmp = np.sum(input_shapes[:, 1:], axis=0)
        result[self.axis] = [input_shapes[0][0], *tmp][self.axis]
        return [tuple(int(x) for x in result)]

    def changes_receptive_field(self):
        return True
    # rf_preimage: default (identity on every input slot) is correct


class Flatten(BaseLayer):
    """(B, ...) -> (B, prod) (reference layers.py:287-304)."""

    def _apply(self, params, X):
        return jnp.reshape(X, (X.shape[0], -1))

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        return [(input_shapes[0][0], int(np.prod(input_shapes[0][1:])))]

    def is_fully_convolutional(self):
        return False

    def rf_preimage(self, axis, positions):
        raise NotImplementedError('The method is not supported by Flatten Layer')


class FullyConnected(BaseLayer):
    """Dense with bias folded into the weight matrix (layers.py:307-363)."""

    def __init__(self, n_input=None, n_output=None, w=None, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_input = n_input
        self.n_output = n_output
        self._fixed_w = w
        if self.input_shapes is None and n_input is not None:
            self.input_shapes = [(None, self.n_input)]
        if self.input_shapes is not None:
            self.initialize(self.input_shapes)
        else:
            self.is_initialized = False

    def initialize(self, input_shapes):
        self.input_shapes = make_list_if_not(input_shapes)
        self.inputs_count = len(self.input_shapes)
        self.n_input = self.input_shapes[0][1]
        if self.n_output is None:
            self.n_output = self.n_input
        self.params = self.init_params()
        self.is_initialized = True

    def init_params(self, key=None):
        if self._fixed_w is not None:
            w = jnp.asarray(self._fixed_w)
            assert w.shape == (self.n_input + 1, self.n_output)
            return {'w': w}
        key = next_key() if key is None else key
        return {'w': self.initializer(key, self.n_input + 1, self.n_output,
                                      self.dtype)}

    def _apply(self, params, X):
        return ops.dense(X, params['w'])

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        return [(input_shapes[0][0], self.n_output)]

    def is_fully_convolutional(self):
        return False

    def changes_receptive_field(self):
        return True

    def rf_preimage(self, axis, positions):
        raise NotImplementedError(
            'The method is not supported by Fully Connected Layer')


class Convolutional2D(BaseLayer):
    """NHWC convolution (reference convolutional.py:12-327).

    Same config surface (kernel_size/padding/padding_value/stride, fixed
    `w`/`b` overrides, `bias` flag) and the reference's joint (w, b)
    initialization from one (prod(k)*cin + 1, cout) matrix
    (convolutional.py:43-47).  Lowers to one MXU conv via ops.conv2d.
    """

    def __init__(self, kernel_size, in_channels=None, out_channels=None,
                 padding=0, padding_value=0, stride=1,
                 w=None, b=None, bias=True, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.kernel_size = tuplize('kernel_size', kernel_size, 2)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.padding = tuplize('padding', padding, 2)
        self.padding_value = padding_value
        self.stride = tuplize('stride', stride, 2)
        self._fixed_w, self._fixed_b, self.bias = w, b, bias

        if self.input_shapes is None and in_channels is not None:
            self.input_shapes = [(None, None, None, self.in_channels)]
        if self.input_shapes is not None:
            self.initialize(self.input_shapes)
        else:
            self.is_initialized = False

    def initialize(self, input_shapes):
        self.input_shapes = make_list_if_not(input_shapes)
        self.inputs_count = len(self.input_shapes)
        self.in_channels = self.input_shapes[0][3]
        if self.out_channels is None:
            self.out_channels = self.in_channels
        self.params = self.init_params()
        self.is_initialized = True

    def init_params(self, key=None):
        w_shape = (*self.kernel_size, self.in_channels, self.out_channels)
        b_shape = (self.out_channels,)
        if self._fixed_w is not None or self._fixed_b is not None:
            w = jnp.asarray(self._fixed_w, dtype=self.dtype)
            b = jnp.asarray(self._fixed_b, dtype=self.dtype)
            assert w.shape == w_shape, f'{w.shape} != {w_shape}'
            assert b.shape == b_shape, f'{b.shape} != {b_shape}'
            return {'w': w, 'b': b}
        key = next_key() if key is None else key
        wb = self.initializer(key, int(np.prod(w_shape[:3])) + 1,
                              self.out_channels, self.dtype)
        return {'w': jnp.reshape(wb[:-1, :], w_shape),
                'b': jnp.reshape(wb[-1, :], b_shape)}

    def _apply(self, params, X):
        return ops.conv2d(X, params['w'], params['b'],
                          stride=self.stride, padding=self.padding,
                          padding_value=self.padding_value, bias=self.bias)

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        return [conv_output_shape(input_shapes[0], self.kernel_size,
                                  self.padding, self.stride, self.out_channels)]

    def changes_receptive_field(self):
        return True

    def rf_preimage(self, axis, positions):
        return {0: _window_preimage(positions, self.kernel_size[axis],
                                    self.padding[axis], self.stride[axis])}


class Conv2DToBatchedFixedWidthed(BaseLayer):
    """Width->batch unfold (reference convolutional.py:330-373); see
    ops.conv.unfold_to_fixed_width."""

    def __init__(self, width, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.width = width

    def _apply(self, params, X):
        return ops.unfold_to_fixed_width(X, self.width)

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        return [unfold_output_shape(s, self.width) for s in input_shapes]


class MaxPool2D(BaseLayer):
    """Max pooling with equal-split tie gradients (reference maxpool.py)."""

    def __init__(self, kernel_size, padding=0, stride=None, ceil_mode=False,
                 *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.kernel_size = tuplize('kernel_size', kernel_size, 2)
        self.padding = tuplize('padding', padding, 2)
        self.stride = (self.kernel_size if stride is None
                       else tuplize('stride', stride, 2))
        self.ceil_mode = ceil_mode

    def _apply(self, params, X):
        return ops.max_pool2d(X, self.kernel_size, self.padding, self.stride,
                              self.ceil_mode)

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        return [pool_output_shape(input_shapes[0], self.kernel_size,
                                  self.padding, self.stride, self.ceil_mode)]

    def changes_receptive_field(self):
        return True

    def rf_preimage(self, axis, positions):
        return {0: _window_preimage(positions, self.kernel_size[axis],
                                    self.padding[axis], self.stride[axis])}


class Upsample2D(BaseLayer):
    """Nearest-neighbor upsample (reference upsample.py:10-135)."""

    def __init__(self, scale_factor, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.scale_factor = tuplize('scale_factor', scale_factor, 2)

    def _apply(self, params, X):
        sy, sx = self.scale_factor
        X = jnp.repeat(X, sy, axis=1)
        return jnp.repeat(X, sx, axis=2)

    def get_output_shapes(self, input_shapes):
        input_shapes = make_list_if_not(input_shapes)
        b, h, w, c = input_shapes[0]
        sy, sx = self.scale_factor
        return [(b, h * sy, w * sx, c)]

    def changes_receptive_field(self):
        return True

    def rf_preimage(self, axis, positions):
        return {0: np.unique(positions // self.scale_factor[axis])}


class Noop(BaseLayer):
    def _apply(self, params, X):
        return X

    def get_output_shapes(self, input_shapes):
        return make_list_if_not(input_shapes)


class Relu(BaseLayer):
    def _apply(self, params, X):
        return ops.relu(X)

    def get_output_shapes(self, input_shapes):
        return make_list_if_not(input_shapes)


class LeakyRelu(BaseLayer):
    def __init__(self, alpha=0.01, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha = alpha

    def _apply(self, params, X):
        return ops.leaky_relu(X, self.alpha)

    def get_output_shapes(self, input_shapes):
        return make_list_if_not(input_shapes)


class Sigmoid(BaseLayer):
    def _apply(self, params, X):
        return ops.sigmoid(X)

    def get_output_shapes(self, input_shapes):
        return make_list_if_not(input_shapes)
