"""Loss classes — surface parity with reference losses.py:4-73.

Each class exposes:
  * `.fn(pred, gt)` — the pure scalar loss from `univer_ocr_tpu.ops.losses`,
    used *inside* jitted model steps (gradients come from jax.grad of the
    whole step, not from a hand-fused pair);
  * `__call__(pred, gt) -> (float(loss), grad)` — the reference's fused
    signature (losses.py:12-25 etc.), kept for the gradient-check harness
    and for any user code written against the reference API.
"""

import jax
import numpy as np

from ..ops import losses as _L


class BaseLoss:
    fn = None

    def __call__(self, prediction, ground_truth):
        import jax.numpy as jnp
        pred = jnp.asarray(prediction)
        gt = jnp.asarray(ground_truth)
        loss, grad = jax.value_and_grad(type(self).fn)(pred, gt)
        return float(loss), grad

    def __repr__(self):
        return f'{type(self).__name__}()'


class SegmentationDice2D(BaseLoss):
    fn = staticmethod(_L.segmentation_dice_2d)


class SegmentationJaccard2D(BaseLoss):
    fn = staticmethod(_L.segmentation_jaccard_2d)


class SigmoidCrossEntropy(BaseLoss):
    fn = staticmethod(_L.sigmoid_cross_entropy)


class SoftmaxCrossEntropy(BaseLoss):
    fn = staticmethod(_L.softmax_cross_entropy)
