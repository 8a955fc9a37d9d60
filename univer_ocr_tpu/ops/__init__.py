"""Pure-functional JAX ops — the TPU compute path.

Every op here is a pure function over `jnp` arrays, traced once under
`jax.jit` and differentiated with `jax.grad`.  Numerical semantics match
the reference's hand-written NumPy/CuPy forward/backward pairs
(web_app/components/nn/), verified by tests/test_parity.py (the TPU-vs-
NumPy analog of the reference's test_identity.py) and numerical gradient
checks (the analog of test_gradients.py).
"""

from .activations import leaky_relu, relu, sigmoid
from .conv import conv2d, conv_output_shape, unfold_to_fixed_width
from .dense import dense
from .initializers import (kaiming_normal, kaiming_uniform, xavier_normal,
                           xavier_uniform)
from .losses import (segmentation_dice_2d, segmentation_jaccard_2d,
                     sigmoid_cross_entropy, softmax_cross_entropy)
from .pool import max_pool2d, pool_output_shape
from .regularizers import l1_regularizer, l2_regularizer
from .upsample import upsample2d

__all__ = [
    'conv2d', 'conv_output_shape', 'unfold_to_fixed_width',
    'max_pool2d', 'pool_output_shape', 'upsample2d', 'dense',
    'relu', 'leaky_relu', 'sigmoid',
    'segmentation_dice_2d', 'segmentation_jaccard_2d',
    'sigmoid_cross_entropy', 'softmax_cross_entropy',
    'xavier_normal', 'xavier_uniform', 'kaiming_normal', 'kaiming_uniform',
    'l1_regularizer', 'l2_regularizer',
]
